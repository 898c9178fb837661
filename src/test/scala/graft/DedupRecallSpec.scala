package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The prefix-filter claim behind `dedup_ngram_jaccard` is EXACT recall:
  * every pair with 3-gram-shingle Jaccard ≥ t shares a prefix shingle,
  * so the blocked join must return exactly the brute-force all-pairs
  * result. Checked on generated corpora with planted near-dups.
  *
  * The one sanctioned recall exception is the oversized-bucket skew cap:
  * a prefix bucket larger than the cap (>cap docs sharing their RAREST
  * shingle — a mass-duplicate population) is dropped so the self-join
  * stays bounded instead of going quadratic; the degenerate-corpus test
  * pins both halves of that trade. */
class DedupRecallSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "dedup-recall-spec")
  import spark.implicits._

  /** Deterministic corpus: base docs from a small vocabulary + planted
    * near-dups (1-2 token edits) + exact dups + short/empty docs. */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val base = (0 until nDocs).map { i =>
      val n = 5 + rnd.nextInt(20)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val planted = base.take(nDocs / 4).map { case (id, text) =>
      val toks = text.split(" ").toBuffer
      toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      (id + nDocs, toks.mkString(" "))
    }
    val exact = base.slice(nDocs / 4, nDocs / 4 + 3).map { case (id, t) => (id + 2 * nDocs, t) }
    val edge = Seq((9000L, ""), (9001L, "one"), (9002L, "one two"), (9003L, "one two three"))
    base ++ planted ++ exact ++ edge
  }

  private def bruteForce(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.5
    } yield (a, b)).toSet
  }

  test("degenerate corpus: oversized prefix bucket is dropped, candidates stay bounded") {
    // 300 mass-duplicates share every shingle (one prefix bucket of 300
    // ≫ cap=100) — without the cap the self-join alone would produce
    // 300*299/2 ≈ 45k candidate pairs from that bucket. With it, the
    // degenerate population contributes ZERO pairs while a normal
    // near-dup pair elsewhere in the corpus is still found.
    val boiler = (0 until 300).map(i => (i.toLong, "alpha bravo charlie delta echo"))
    val pair = Seq(
      (9100L, "golf hotel india juliet kilo lima golf hotel"),
      (9101L, "golf hotel india juliet kilo lima golf mike"))
    val docs = boiler ++ pair
    val dir = Files.createTempDirectory("graft-recall-degenerate").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.ngramJaccard(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((9100L, 9101L)),
      s"expected only the planted pair; got ${got.size} pairs: ${got.take(5)}")
  }

  test("substring windows: shared passages and verbatim copies are caught, unique text is clean") {
    // Window/stride fingerprinting catches a duplicated span when its
    // windows ALIGN across documents — guaranteed for shared prefixes
    // (boilerplate headers, the dominant web-corpus case) and for
    // verbatim copies; that's the stride approximation's contract.
    val license = "Licensed under the Example License Version 2.0 you may not use this file except in " // 84 chars
    val tails = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "pack my box with five dozen liquor jugs said the sphinx of quartz",
      "how vexingly quick daft zebras jump over the fence in the morning")
    val boiler = tails.zipWithIndex.map { case (t, i) => (i.toLong, license + t) }
    val copyText = "this exact document is stored twice in the corpus word for word with no edits at all"
    val copies = Seq((100L, copyText), (101L, copyText))
    val unique = Seq((200L, "zero overlap here: completely singular phrasing nothing shared with any sibling document"))
    val dir = Files.createTempDirectory("graft-substring-dup").toString
    (boiler ++ copies ++ unique).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.dedupSubstring(spark, dir)
      .select("doc_id", "dup_windows", "n_windows", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    Seq(100L, 101L).foreach { id =>
      assert(got(id)._4 == 1.0, s"verbatim copy $id has dup_ratio ${got(id)._4}, want 1.0")
    }
    assert(got(200L)._2 == 0L, s"unique doc flagged with ${got(200L)._2} dup windows")
    Seq(0L, 1L, 2L).foreach { id =>
      assert(got(id)._2 >= 1L && got(id)._2 < got(id)._3,
        s"boilerplate doc $id: dup_windows=${got(id)._2} of ${got(id)._3} — " +
          "shared prefix must flag some but not all windows")
    }
  }

  test("winnowing guarantee: any shared substring of length >= w+k-1 shares a fingerprint") {
    import spark.implicits._
    // shared passage of 40 chars (> 8+16-1 = 23) planted in two docs
    // with different surroundings; a third doc shares nothing
    val passage = "the quick brown fox jumps over the dairy"
    val docs = Seq(
      (1L, s"AAAA bbbb cccc dddd $passage eeee ffff gggg hhhh"),
      (2L, s"zzzz yyyy xxxx wwww vvvv uuuu $passage tttt ssss"),
      (3L, "totally unrelated content with nothing shared at all here okay")
    ).toDF("doc_id", "text")
    val fps = DedupQueries.winnowFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "docs sharing a 40-char passage must share a winnowing fingerprint")
    assert(fps(3L).intersect(fps(1L)).isEmpty && fps(3L).intersect(fps(2L)).isEmpty,
      "unrelated text must not collide")
    // density: winnowing selects ~2/(w+1) of gram positions, never more
    // than one per window start
    val nGrams = docs.filter($"doc_id" === 3L).head.getString(1).length - 15
    assert(fps(3L).size <= nGrams - 7, "more fingerprints than windows")
  }

  test("containment catches an excerpt that symmetric Jaccard misses") {
    import spark.implicits._
    // doc 1 is a SHORT excerpt fully contained in LONG doc 2: their
    // shingle Jaccard is tiny (|A∩B|/|A∪B| with |B| >> |A|) — below any
    // sane near-dup threshold — but containment of the smaller side ~ 1
    val excerpt = "the quick brown fox jumps over the lazy dairy cow daily"
    val filler = (1 to 30).map(i => s"unique$i filler$i").mkString(" ")
    val docs = Seq(
      (1L, excerpt),
      (2L, s"$filler $excerpt more trailing content never seen elsewhere"),
      (3L, "totally unrelated content with nothing shared at all here okay")
    ).toDF("doc_id", "text")
    val pairs = DedupQueries.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSeq
    assert(pairs.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.8 },
      s"excerpt pair not caught: $pairs")
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L },
      s"unrelated doc flagged: $pairs")
    // and the Jaccard the near-dup family uses really IS low here —
    // the asymmetric relation is invisible to a 0.5 jaccard gate
    val sets = DedupQueries.winnowFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val j = sets(1L).intersect(sets(2L)).size.toDouble / sets(1L).union(sets(2L)).size
    assert(j < 0.5, s"fixture not asymmetric enough: jaccard $j")
  }

  test("corpus_split: no near-dup pair straddles the train/val boundary") {
    // the operator's whole reason to exist — every clustered doc must
    // land on the same side as its cluster representative, and both
    // sides must be non-trivially populated
    val sf = "/root/testdata/sf0.001"
    val split = graft.queries.CurationQueries.corpusSplit(spark, sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val labels = DedupQueries.dedupClusters(spark, sf)
      .as[(Long, Long)].collect()
    labels.foreach { case (doc, cluster) =>
      assert(split(doc) == split(cluster),
        s"doc $doc (split ${split(doc)}) straddles from its cluster rep " +
          s"$cluster (split ${split(cluster)})")
    }
    val sides = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sides.keySet == Set("train", "val") && sides("val") > 0,
      s"split sides degenerate: $sides")
  }

  test("cluster propagation converges on a diameter-60 path graph") {
    // plain min-label propagation needs diameter rounds (60 here, over
    // any sane cap); pointer jumping must converge in O(log 60) rounds
    val edges = (0L until 60L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("doc_a", "doc_b")
    val labels = DedupQueries.clusterLabels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == (0L to 60L).toSet)
    assert(labels.values.forall(_ == 0L),
      s"every chain node must reach the component min: ${labels.toSeq.sorted.take(8)}")
  }

  test("components keep separate labels; a hit round cap fails loudly") {
    val e1 = (0L until 10L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val e2 = (100L until 110L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val labels = DedupQueries.clusterLabels((e1 ++ e2).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 10L).forall(labels(_) == 0L), s"first component: $labels")
    assert((100L to 110L).forall(labels(_) == 100L), s"second component: $labels")
    // an unconverged result must throw (silently wrong labels are the
    // one unacceptable outcome), and the message names the knob
    val chain = (0L until 40L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("doc_a", "doc_b")
    val e = intercept[RuntimeException](
      DedupQueries.clusterLabels(chain, maxRounds = 2))
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("prefix-filter blocking returns the exact brute-force pair set") {
    Seq(11L, 42L).foreach { seed =>
      val docs = corpus(seed, 60)
      val dir = Files.createTempDirectory(s"graft-recall-$seed").toString
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val got = DedupQueries.ngramJaccard(spark, dir)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val want = bruteForce(docs)
      assert(got == want,
        s"seed=$seed missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"seed=$seed corpus must contain true near-dup pairs")
    }
  }

  test("prefix rank cutoff: repeated-shingle-heavy corpora match brute force") {
    // The blocked join only materializes prefix membership for REPEATED
    // shingles (df >= 2); a repeated shingle at sorted position i of a
    // doc's repeated subset R is in the prefix iff i <= p - n + |R|.
    // A 4-word vocabulary makes nearly every shingle repeated, so the
    // cutoff arithmetic is exercised at every boundary (including docs
    // of exactly 3 tokens, where n = 1 and p = 1).
    Seq(3L, 17L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd")
      val docs = (0 until 80).map { i =>
        val n = 3 + rnd.nextInt(12)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val dir = Files.createTempDirectory(s"graft-rank-$seed").toString
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val got = DedupQueries.ngramJaccard(spark, dir)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val want = bruteForce(docs)
      assert(got == want,
        s"seed=$seed missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"seed=$seed corpus must contain true near-dup pairs")
    }
  }

  test("property: incremental label maintenance equals full recompute on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val n = 40 + rnd.nextInt(40)
      val pairs = (0 until n).map { _ =>
        val a = rnd.nextInt(60).toLong; var b = rnd.nextInt(60).toLong
        if (a == b) b = (b + 1) % 60
        (math.min(a, b), math.max(a, b))
      }.distinct
      // arbitrary split: ~60% base, rest arrives later (some increments
      // merge existing clusters, some bring brand-new nodes)
      val (base, inc) = pairs.partition(_ => rnd.nextBoolean() || rnd.nextBoolean())
      def both(ps: Seq[(Long, Long)]) =
        ps.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("doc_a", "doc_b")
      val full = DedupQueries.clusterLabels(both(pairs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val baseLabels =
        if (base.isEmpty) Seq.empty[(Long, Long)].toDF("id", "label")
        else DedupQueries.clusterLabels(both(base))
      val updated = DedupQueries
        .clusterLabelsIncremental(baseLabels, inc.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(updated == full,
        s"trial $trial: incremental diverged\n full=${full.toSeq.sorted}\n got=${updated.toSeq.sorted}")
    }
  }

  test("incremental maintenance handles the no-op and merge-two-clusters cases") {
    val base = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L)).toDF("doc_a", "doc_b")
    val labels = DedupQueries.clusterLabels(base)
    // intra-cluster pair: nothing changes
    val same = DedupQueries.clusterLabelsIncremental(labels, Seq((1L, 2L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(same == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    // bridge pair merges both clusters onto the global min rep
    val merged = DedupQueries.clusterLabelsIncremental(labels, Seq((2L, 11L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L), merged.toString)
  }
}
