package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Extension-operator invariants (SURVEY.md §2.4): LSH recall against the
  * exact join it approximates, signature determinism, feature shape. */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH candidates recover >=80% of exact near-dup pairs") {
    val exact = pairs("q_neardup")
    val lsh = pairs("q_dedup_minhash")
    assert(exact.nonEmpty, "expected planted near-dups in testdata")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("incremental near-dup recovers >=80% of exact pairs crossing the batch split") {
    // the history-aware path: exact pairs with EXACTLY ONE endpoint in
    // the mod-10 batch are what an arriving batch must catch against
    // the persisted band index (batch-internal pairs are the in-batch
    // job's domain, both-history pairs were catchable at THEIR arrival)
    def inBatch(id: Long) = id % 10 == 0
    val exactCross = pairs("q_neardup").filter {
      case (a, b) => inBatch(a) != inBatch(b)
    }
    assert(exactCross.nonEmpty, "expected planted pairs across the split")
    val found = SparkEntry.queries("q_neardup_incremental")(spark, sf)
      .collect().map(r => {
        val (n, o) = (r.getLong(0), r.getLong(1))
        (math.min(n, o), math.max(n, o))
      }).toSet
    val recall = exactCross.count(found.contains).toDouble / exactCross.size
    info(f"incremental recall $recall%.2f over ${exactCross.size} cross pairs")
    assert(recall >= 0.8,
      s"incremental near-dup recall $recall over ${exactCross.size} pairs")
  }

  test("incremental near-dup ingest is replay-stable and pins its partitioning") {
    import graft.operators.IncrementalNearDup
    val dir = java.nio.file.Files.createTempDirectory("inddx").toFile
    try {
      val docs = Tables.documents(spark, sf)
      val history = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      IncrementalNearDup.ingest(spark, dir.getPath, history,
        "doc_id", "text", parts = 8)
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val first = pairSet(IncrementalNearDup.ingest(
        spark, dir.getPath, batch, "doc_id", "text", parts = 8))
      // crash-replay: the batch's band rows are already in the index —
      // the result must be the SAME history pairs, with no
      // batch-internal pairs leaking in
      val replay = pairSet(IncrementalNearDup.ingest(
        spark, dir.getPath, batch, "doc_id", "text", parts = 8))
      assert(replay == first, "replayed ingest changed the result set")
      // stored-wins partitioning: a later caller passing the WRONG
      // parts still reads the marker's 8 — same pairs, no silent misses
      val wrongParts = pairSet(IncrementalNearDup.ingest(
        spark, dir.getPath, batch, "doc_id", "text", parts = 64))
      assert(wrongParts == first,
        "a mismatched parts parameter changed lookup results — the " +
          "_parts marker must be authoritative")
      assert(new java.io.File(dir, "_parts").exists())
      // param pinning: a later caller passing a different rowsPerBand
      // must adopt the stored banding (a mismatch would hash different
      // bands against the stored rows → zero/garbage candidates)
      val wrongBanding = pairSet(IncrementalNearDup.ingest(
        spark, dir.getPath, batch, "doc_id", "text",
        rowsPerBand = 2, parts = 64))
      assert(wrongBanding == first,
        "a mismatched rowsPerBand changed lookup results — banding " +
          "params must be pinned in the marker")
    } finally LocalFs.rmrf(dir)
  }

  test("incremental near-dup rejects a torn index (data partitions, no marker)") {
    import graft.operators.IncrementalNearDup
    val dir = java.nio.file.Files.createTempDirectory("inddx-torn").toFile
    try {
      val docs = Tables.documents(spark, sf).limit(20)
      IncrementalNearDup.ingest(spark, dir.getPath, docs, "doc_id", "text",
        parts = 4)
      // simulate the torn state a pre-marker-first writer could leave:
      // band partitions present, marker gone
      assert(new java.io.File(dir, "_parts").delete())
      val e = intercept[RuntimeException] {
        IncrementalNearDup.ingest(spark, dir.getPath, docs, "doc_id", "text",
          parts = 8)
      }
      assert(e.getMessage.contains("torn"),
        s"expected a torn-index rejection, got: ${e.getMessage}")
    } finally LocalFs.rmrf(dir)
  }

  test("fuzzy match: planted distances, band is lossless, duplicates collapse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    // kitten↔sitting d=3 (len diff 1), flaw↔lawn d=2, ab↔flaw and
    // ab↔lawn d=3 (2 inserts + 1 sub); flaw↔kitten d=6 (in band but
    // over threshold); "abcdefghij"↔"ab" len diff 8 — outside the
    // band, and d=8 > 3 anyway (edit distance ≥ length diff is WHY
    // the band is lossless); dup rows dedupe first
    Seq((1L, "kitten"), (2L, "sitting"), (3L, "flaw"), (4L, "lawn"),
      (5L, "abcdefghij"), (6L, "ab"), (7L, "kitten"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = SparkEntry.queries("q_fuzzy_match")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("flaw", "lawn", 2L), ("ab", "flaw", 3L),
      ("ab", "lawn", 3L), ("kitten", "sitting", 3L)))
  }

  test("exact dedup keeps every distinct text once") {
    val docs = Tables.documents(spark, sf)
    val deduped = SparkEntry.queries("q_dedup_exact")(spark, sf)
    assert(deduped.count() == docs.select("text").distinct().count())
    // idempotence: n_copies sums back to the row count
    assert(deduped.agg(sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("similarity top-k: k rows per probe, scores within [-1, 1] and descending") {
    val rows = SparkEntry.queries("q_similarity_topk")(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (qid, rs) =>
      assert(rs.length == 5, s"probe $qid has ${rs.length} results")
      val scores = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(scores.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(scores.sameElements(scores.sorted.reverse), s"probe $qid not descending")
    }
  }

  test("bm25 search: term-bearing docs only, tf beats sparsity, ranks dense") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark query engine"),
      (2L, "spark query engine"),
      (3L, "unrelated words entirely here"),
      (4L, "spark")).toDF("doc_id", "text")
    val r = graft.operators.TextSearch
      .bm25(docs, "doc_id", "text", Seq("spark"), topK = 3).collect()
    val ids = r.map(_.getLong(0)).toSeq
    assert(!ids.contains(3L), "doc without the term must not match")
    assert(ids.toSet == Set(1L, 2L, 4L))
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L), "rnk must be 1..k")
    val score = r.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(score(1L) > score(2L), "tf=3 must outrank tf=1 at comparable length")
    assert(score.values.forall(_ > 0))
  }

  test("phrase search: adjacency required, occurrences counted, repeated-word phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big data pipeline runs big data pipeline twice"), // 2 occurrences
      (2L, "a data pipeline here"),                           // 1 occurrence
      (3L, "data flows through the pipeline"),                // both terms, NOT adjacent
      (4L, "pipeline data reversed order"),                   // adjacent, wrong order
      (5L, "nothing relevant")).toDF("doc_id", "text")
    val r = graft.operators.TextSearch
      .phrase(docs, "doc_id", "text", Seq("data", "pipeline"), topK = 10).collect()
    val ids = r.map(_.getLong(0)).toSeq
    assert(ids.toSet == Set(1L, 2L), s"only contiguous in-order matches, got $ids")
    assert(!ids.contains(3L), "non-adjacent decoy must not match")
    assert(!ids.contains(4L), "reversed-order decoy must not match")
    val score = r.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(score(1L) > score(2L), "tf=2 must outrank tf=1 at comparable length")
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 2L), "rnk dense 1..k")
    // repeated word inside the phrase: anchors must not cross-talk
    val rep = Seq(
      (1L, "go go go stop"),   // "go go" occurs at anchors 0 and 1
      (2L, "go stop go"),      // never adjacent
      (3L, "go go")).toDF("doc_id", "text")
    val rr = graft.operators.TextSearch
      .phrase(rep, "doc_id", "text", Seq("go", "go"), topK = 10).collect()
    val rtf = rr.map(_.getLong(0)).toSeq
    assert(rtf.toSet == Set(1L, 3L), s"repeated-word phrase matches, got $rtf")
  }

  test("phraseAt: distance-N matching (Postgres '<N>' operator semantics)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha x beta rest"),   // alpha <2> beta (one word between)
      (2L, "alpha beta"),          // adjacent — NOT distance 2
      (3L, "alpha x y beta"),      // distance 3 — no
      (4L, "beta x alpha")).toDF("doc_id", "text")
    val r = graft.operators.TextSearch
      .phraseAt(docs, "doc_id", "text", Seq(("alpha", 0), ("beta", 2)), topK = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L), s"only exact distance-2 in order matches, got $r")
    // phrase() is phraseAt with consecutive offsets — identical output
    val viaPhrase = graft.operators.TextSearch
      .phrase(docs, "doc_id", "text", Seq("alpha", "beta"), topK = 10)
      .collect().map(_.getLong(0)).toSeq
    val viaAt = graft.operators.TextSearch
      .phraseAt(docs, "doc_id", "text", Seq(("alpha", 0), ("beta", 1)), topK = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(viaPhrase == viaAt && viaPhrase == Seq(2L))
    intercept[IllegalArgumentException] {
      graft.operators.TextSearch.phraseAt(
        docs, "doc_id", "text", Seq(("a", 0), ("b", 0)))
    }
  }

  test("redaction: each PII kind masks, URLs before emails, non-PII untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "see https://ex.com/a?user=b@c.de for info"),
      (3L, "call +44 20 7946 0958 now"),
      (4L, "card 4111 1111 1111 1111 on file"),
      (5L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val out = graft.operators.Redaction.redact(df, Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at <EMAIL> today")
    assert(out(2L) == "see <URL> for info",
      s"the whole URL (incl. the embedded address) is one token: ${out(2L)}")
    assert(out(3L) == "call <PHONE> now")
    assert(out(4L) == "card <NUMBER> on file")
    assert(out(5L) == "nothing sensitive here at all")
    // boundary anchoring: a 20+-digit run is NOT a card shape — the old
    // unanchored pattern ate its first 19 digits mid-token. A letter is
    // a legitimate boundary, so a letter-prefixed 16-digit run DOES
    // redact (card shape with a clean non-digit edge), and the boundary
    // chars themselves are restored by the capture groups.
    val longRun = Seq((6L, "serial 123456789012345678901 ok"),
      (7L, "v1234567890123456"),
      (8L, "(4111111111111111)")).toDF("doc_id", "text")
    val lr = graft.operators.Redaction.redact(longRun, Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lr(6L) == "serial 123456789012345678901 ok",
      s"21-digit run must survive intact: ${lr(6L)}")
    assert(lr(7L) == "v<NUMBER>", lr(7L))
    assert(lr(8L) == "(<NUMBER>)", lr(8L))
    // kind filter: only emails masked when asked
    val onlyEmail = graft.operators.Redaction
      .redact(df, Seq("text"), kinds = Seq("email"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(onlyEmail(1L).contains("<EMAIL>") && onlyEmail(3L).contains("+44"))
    intercept[IllegalArgumentException] {
      graft.operators.Redaction.redactCol(col("text"), Seq("nope"))
    }
  }

  test("decontamination: planted 8-gram collision flagged, clean() removes it") {
    import spark.implicits._
    val gram = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"prefix words $gram suffix words here"), // contains the bench 8-gram
      (2L, "totally unrelated content with enough words to shingle fine okay"),
      (3L, s"one two three four five SIX seven eight nine")) // breaks the gram
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$gram and some trailing tokens"))
      .toDF("bench_id", "text")
    val flagged = graft.operators.Decontamination
      .overlaps(corpus, "doc_id", "text", bench, "bench_id", "text",
        w = 8, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.map(_._1).toSet == Set(1L),
      s"only the doc containing the exact 8-gram is contaminated, got ${flagged.toSeq}")
    assert(flagged.head._3 >= 1L)
    val cleaned = graft.operators.Decontamination
      .clean(corpus, "doc_id", "text", bench, "bench_id", "text",
        w = 8, minOverlap = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleaned == Set(2L, 3L), s"clean() must drop doc 1, got $cleaned")
    // both frames using the SAME id name must not produce an ambiguous
    // duplicate column (the bench side disambiguates to doc_id_bench)
    val sameName = graft.operators.Decontamination
      .clean(corpus, "doc_id", "text",
        bench.withColumnRenamed("bench_id", "doc_id"), "doc_id", "text",
        w = 8, minOverlap = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sameName == Set(2L, 3L), s"same-name ids must still clean, got $sameName")
  }

  test("bm25Batch per-query ranking equals the single-query operator") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val batch = graft.queries.Extensions.searchBatch
    val got = graft.operators.TextSearch
      .bm25Batch(docs, "doc_id", "text",
        batch.toDF("query_id", "term"), "query_id", "term", topK = 10)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3))
        .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq).toMap
    batch.groupBy(_._1).foreach { case (qid, qterms) =>
      val single = graft.operators.TextSearch
        .bm25(docs, "doc_id", "text", qterms.map(_._2), topK = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(got(qid) == single, s"query $qid diverges from single-query bm25")
    }
  }

  test("bm25 requireAll keeps only docs containing every term, scores unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark query engine spark"),
      (2L, "spark only here"),
      (3L, "query only here"),
      (4L, "unrelated words")).toDF("doc_id", "text")
    val both = graft.operators.TextSearch
      .bm25(docs, "doc_id", "text", Seq("spark", "query"), topK = 10, requireAll = true)
      .collect()
    assert(both.map(_.getLong(0)).toSeq == Seq(1L), "only doc 1 has both terms")
    // the conjunctive filter must not change the surviving doc's score
    val orScore = graft.operators.TextSearch
      .bm25(docs, "doc_id", "text", Seq("spark", "query"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(both.head.getDouble(1) == orScore(1L))
  }

  test("probe batch is fixed-size and deterministic under a 10x corpus") {
    import spark.implicits._
    def corpus(n: Int) = spark.range(n).select(
      col("id").as("vec_id"),
      array(lit(1.0f), lit(0.0f)).as("embedding"))
    val k = graft.queries.Extensions.ProbeBatchSize
    val small = graft.queries.Extensions.probeBatch(corpus(1000))
      .select("vec_id").as[Long].collect().sorted.toSeq
    val big = graft.queries.Extensions.probeBatch(corpus(10000))
      .select("vec_id").as[Long].collect().sorted.toSeq
    // the broadcast side of every probe join is O(K) at any corpus size,
    // and the batch itself is the SAME K ids — not just the same count
    assert(small.size == k, s"expected $k probes, got ${small.size}")
    assert(big == small, s"probe batch changed under 10x corpus: $big vs $small")
  }

  test("IVF results are a subset-quality approximation of brute force") {
    val exact = SparkEntry.queries("q_similarity_topk")(spark, sf)
      .filter(col("rnk") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, sf)
      .filter(col("rnk") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every probe answered, and the approximate top-1 never beats exact
    assert(ivf.keySet == exact.keySet)
    ivf.foreach { case (q, c) => assert(c <= exact(q) + 1e-9) }
  }

  test("q_ann_ivf_serve equals q_ann_ivf (same model, no refit in the query path)") {
    // clear any stale committed model so serve's first run fits the SAME
    // model q_ann_ivf fits (deterministic trainer, same data/k/iters) —
    // then the persisted-model path must return identical rankings
    val modelFile = new java.io.File(
      "/root/repo/target/ann_models/ivf_k8_" + new java.io.File(sf).getName + ".model")
    modelFile.delete()
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val fitPath = rows("q_ann_ivf")
    val servedFirst = rows("q_ann_ivf_serve") // fits + commits the model
    assert(modelFile.exists(), "first serve run must commit the model file")
    val servedAgain = rows("q_ann_ivf_serve") // pure load + search
    assert(servedFirst == fitPath, "serve (fit+commit) must equal the fit-per-run key")
    assert(servedAgain == fitPath, "serve (load) must equal the fit-per-run key")
  }

  test("ANN recall@3 vs exact brute force stays above the per-index gate") {
    // quantitative regression gate: a parameter change (fewer probes,
    // coarser buckets, fewer planes) that silently destroys recall must
    // fail HERE, not surface as bad search quality in production
    def top3(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf).filter(col("rnk") <= 3).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = top3("q_similarity_topk")
    assert(exact.nonEmpty)
    // gates are measured floors minus safety margin (IVF nprobe=2/8 cells,
    // LSH 6 planes on this corpus) — a probe missing from the ANN output
    // counts as zero recall for that probe, not as excluded
    // int8 quantization distorts cosine by <=~1/127 per vector — its
    // recall floor is near-exact, far above the cell/bucket indexes
    // the composed quantized IVF inherits the IVF cell-pruning floor
    // (nprobe=2 of 8 cells); the int8 layer costs ~nothing on top
    for ((name, gate) <- Seq("q_ann_ivf" -> 0.5, "q_ann_lsh" -> 0.3,
        "q_ann_quantized" -> 0.9, "q_ann_ivf_quantized" -> 0.5)) {
      val ann = top3(name)
      val recalls = exact.map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).count(ex.contains).toDouble / ex.size }
      val mean = recalls.sum / recalls.size
      info(f"$name mean recall@3 = $mean%.3f over ${exact.size} probes")
      assert(mean >= gate, f"$name recall@3 $mean%.3f below gate $gate")
    }
  }

  test("documents corpus is ASCII (q_multimodal_features oracle precondition)") {
    // the DuckDB oracle recomputes byte histograms via ascii() per
    // CHARACTER; that equals the Spark byte-level histogram only while
    // every document is single-byte ASCII (empty docs are filtered
    // symmetrically on both sides). Assert it so a testdata change that
    // breaks the assumption fails loudly here, not as a silent hash
    // mismatch.
    val bad = Tables.documents(spark, sf)
      .where(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(bad == 0, s"$bad docs are non-ASCII; oracle assumption broken")
  }

  test("byte-histogram features are normalized and deterministic") {
    val f1 = SparkEntry.queries("q_multimodal_features")(spark, sf).collect()
    val f2 = SparkEntry.queries("q_multimodal_features")(spark, sf).collect()
    assert(f1.sameElements(f2))
    f1.take(20).foreach { r =>
      val s = (1 to 8).map(r.getDouble).sum
      assert(math.abs(s - 1.0) < 0.01, s"histogram not normalized: $s")
    }
  }

  test("fused cosine expression is numerically identical to the HOF formulation") {
    import graft.functions.{VectorExpressions, VectorOps}
    VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val both = a.join(b, col("ida") < col("idb"))
      .select(
        VectorExpressions.cosineFast(col("ea"), col("eb")).as("fast"),
        VectorOps.cosine(col("ea"), col("eb")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fast=${r.getDouble(0)} hof=${r.getDouble(1)}"))
  }

  test("word_jaccard expression matches the DataFrame set-jaccard formulation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(30).select("doc_id", "text")
    val a = docs.select(col("doc_id").as("ida"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("idb"), col("text").as("tb"))
    val pairs = a.join(b, col("ida") < col("idb"))
    val viaExpr = pairs.select(col("ida"), col("idb"),
      round(call_function("word_jaccard", col("ta"), col("tb")), 6).as("j"))
    val viaDf = pairs.select(col("ida"), col("idb"),
      round(
        size(array_intersect(split(col("ta"), " "), split(col("tb"), " "))).cast("double") /
          size(array_union(split(col("ta"), " "), split(col("tb"), " "))), 6).as("j"))
    val diff = viaExpr.except(viaDf).count() + viaDf.except(viaExpr).count()
    assert(diff == 0)
  }

  test("minhash candidates carry exact word-jaccard confirmation") {
    val rows = SparkEntry.queries("q_dedup_minhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Double]("exact_word_jaccard")
      assert(exact >= 0.0 && exact <= 1.0)
      // planted near-dups: candidates surfaced by LSH really are similar
      assert(exact > 0.5, s"candidate pair ${r} not actually similar")
    }
  }

  test("xx fingerprint is stable and collision-free on distinct texts") {
    val fp = Tables.documents(spark, sf)
      .select(graft.functions.TextOps.xxFingerprint(col("text")).as("fp"))
    assert(fp.distinct().count() == Tables.documents(spark, sf).count())
  }

  test("top_k_pairs aggregate equals the window top-k on every partitioning") {
    import org.apache.spark.sql.expressions.Window
    graft.functions.TopKAggregate.register(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
      .collect().map(_.toString).toSeq
    // repartition to many small partitions so the serialize/merge path of
    // the TypedImperativeAggregate (partial heaps per map task) is hit
    for (parts <- Seq(1, 7, 32)) {
      val viaAgg = Tables.orders(spark, sf)
        .repartition(parts)
        .groupBy("o_custkey")
        .agg(call_function("top_k_pairs",
          col("o_totalprice"), col("o_orderkey"), lit(3)).as("tk"))
        .select(col("o_custkey"), posexplode(col("tk")))
        .select(col("o_custkey"), col("col.id").as("o_orderkey"),
          col("col.v").as("o_totalprice"), (col("pos") + 1).as("rn"))
        .orderBy("o_custkey", "rn")
        .collect().map(_.toString).toSeq
      assert(viaAgg == viaWindow, s"mismatch at $parts partitions")
    }
  }

  test("dedup clusters are closed over near-dup pairs with min-id canonicals") {
    val cluster = SparkEntry.queries("q_dedup_cluster")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairEdges = pairs("q_neardup")
    assert(pairEdges.nonEmpty && cluster.nonEmpty)
    // both endpoints of every pair land in the same cluster
    pairEdges.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // the cluster id is the minimum member (the keeper)
    cluster.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid: min member ${members.keys.min}")
    }
  }

  test("char-ngram lang-ID: every doc classified, deterministic, scores bounded") {
    val a = SparkEntry.queries("q_lang_id_ngram")(spark, sf).collect()
    val b = SparkEntry.queries("q_lang_id_ngram")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == Tables.documents(spark, sf).count())
    val labels = Tables.documents(spark, sf).select("lang").distinct()
      .collect().map(_.getString(0)).toSet + "und"
    a.foreach { r =>
      val score = r.getLong(2)
      assert(score >= 0 && score <= 100, s"score out of profile bound: $r")
      assert(labels.contains(r.getString(1)), s"unknown label in $r")
    }
  }

  test("hot-shingle df cap stops quadratic candidate inflation") {
    import spark.implicits._
    // 60 docs that share exactly ONE trigram ("one of the") and are
    // otherwise disjoint: without the df cap every pair shares a key in
    // the inverted index, so candidate generation is C(60,2) = 1770
    // pairs from a single stop-phrase — the at-scale killer
    val docs = (0 until 60)
      .map(i => (i.toLong, s"one of the u$i v$i w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val uncapped = graft.queries.Extensions
      .nearDupPairsOf(docs, threshold = 0.0, maxShingleDf = Int.MaxValue)
    val capped = graft.queries.Extensions
      .nearDupPairsOf(docs, threshold = 0.0, maxShingleDf = 50)
    assert(uncapped.count() == 60L * 59 / 2,
      "without the cap, one hot shingle pairs every doc with every other")
    assert(capped.count() == 0,
      "with df cap < 60 the stop-phrase shingle is dropped and no pairs remain")
    // and the cap is a no-op for genuinely discriminative shingles:
    // planted near-dups at the real threshold survive it
    val real = pairs("q_neardup")
    assert(real.nonEmpty)
  }

  test("all-pairs exact twins refuse corpus-sized input") {
    import graft.queries.Extensions.requireAllPairsSafe
    val big = spark.range(200).toDF("vec_id")
    val ex = intercept[IllegalArgumentException] {
      requireAllPairsSafe(big, "q_test_twin", cap = 100)
    }
    assert(ex.getMessage.contains("q_ann_ivf"))
    // under the cap: no exception
    requireAllPairsSafe(big.limit(50), "q_test_twin", cap = 100)
  }

  test("classifyLocal agrees with the distributed join-based classify") {
    import graft.functions.LangId
    val docs = Tables.documents(spark, sf)
    val model = LangId.trainProfiles(docs, "lang", "text", k = 50)
    val local = LangId.trainProfilesLocal(docs, "lang", "text", k = 50)
    val viaJoin = LangId.classify(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val viaLocal = LangId.classifyLocal(docs, "doc_id", "text", local)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(viaLocal == viaJoin)
  }

  test("connected components throws on non-convergence instead of splitting clusters") {
    import spark.implicits._
    // a 30-hop chain needs ~29 min-label rounds; maxIter=3 must fail loudly
    val chain = (0L until 30L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.run(chain, "a", "b", maxIter = 3).count()
    }
    assert(ex.getMessage.contains("did not converge"))
    // and with enough rounds the same chain converges to one cluster
    val ok = graft.operators.ConnectedComponents.run(chain, "a", "b", maxIter = 35)
    assert(ok.select("lbl").distinct().count() == 1)
  }

  test("star contraction: deep chain converges in O(log n) rounds where min-label cannot") {
    import spark.implicits._
    // a 40-hop chain needs ~39 min-label rounds; star contraction must
    // finish the same graph well inside 15 (log-bound), with one cluster
    // labeled by the chain's minimum node
    val chain = (0L until 40L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.run(chain, "a", "b", maxIter = 15).count()
    }
    val star = graft.operators.ConnectedComponents
      .runStarContraction(chain, "a", "b", maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.keySet == (0L until 40L).toSet)
    assert(star.values.toSet == Set(0L))
  }

  test("star contraction edge cases: self-loops, two-node, pre-star, singleton-adjacent") {
    import spark.implicits._
    val edges = Seq(
      (7L, 7L),            // self-loop-only node: labels itself
      (10L, 11L),          // two-node component
      (20L, 21L), (20L, 22L), (20L, 23L), // already a star (centered at min)
      (30L, 31L), (31L, 31L) // self-loop on a node that also has a real edge
    ).toDF("a", "b")
    val got = graft.operators.ConnectedComponents
      .runStarContraction(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      7L -> 7L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got == want)
  }

  test("both clustering paths agree on the real near-dup pair set") {
    val viaRun = SparkEntry.queries("q_dedup_cluster")(spark, sf)
      .collect().map(_.toString).toSeq
    val viaStar = SparkEntry.queries("q_dedup_cluster_star")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(viaRun.nonEmpty && viaStar == viaRun)
  }

  test("top_k_pairs coerces int inputs and rejects non-literal k at analysis time") {
    graft.functions.TopKAggregate.register(spark)
    Tables.orders(spark, sf).createOrReplaceTempView("orders_tk_types")
    // int value + int id: implicit casts make this analyze and run
    val n = spark.sql(
      """SELECT o_custkey, top_k_pairs(CAST(o_orderkey AS INT),
        |       CAST(o_orderkey AS INT), 2) AS tk
        |FROM orders_tk_types GROUP BY o_custkey""".stripMargin).count()
    assert(n > 0)
    // non-literal k fails analysis, not at executor time
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT o_custkey, top_k_pairs(o_totalprice, o_orderkey, o_custkey) AS tk
          |FROM orders_tk_types GROUP BY o_custkey""".stripMargin).collect()
    }
  }

  test("top_k_pairs: NaN values are skipped, never freezing a full heap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.call_function
    graft.functions.TopKAggregate.register(spark)
    // NaN first so it fills the k=2 heap before the real values arrive:
    // under IEEE comparisons nothing beats a NaN head (v > NaN is
    // false), so an un-skipped NaN would freeze the heap and lose 9.0
    val df = Seq((1L, Double.NaN, 100L), (1L, 1.0, 1L),
      (1L, 9.0, 9L), (1L, 5.0, 5L)).toDF("g", "v", "id")
    val tk = df.groupBy("g")
      .agg(call_function("top_k_pairs", $"v", $"id", org.apache.spark.sql.functions.lit(2)).as("tk"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(tk == Seq((9.0, 9L), (5.0, 5L)), s"NaN must not poison top-k, got $tk")
  }

  test("count-min sketch estimates bound exact counts (overestimate-only)") {
    val est = SparkEntry.queries("q_agg_countmin")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .filter(col("o_custkey").between(1, 10))
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.orders(spark, sf).count()
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS must never underestimate: key $k est ${est(k)} < $c")
      assert(est(k) <= c + (0.001 * n).ceil.toLong + 1,
        s"key $k est ${est(k)} outside eps bound (exact $c, n $n)")
    }
  }

  test("variant path extraction agrees with the JSON-string functions") {
    val viaVariant = SparkEntry.queries("q_fn_variant")(spark, sf)
      .select("event_id", "k_int").collect().map(_.toString).toSeq
    val viaJson = SparkEntry.queries("q_fn_json")(spark, sf)
      .select("event_id", "k_int").collect().map(_.toString).toSeq
    assert(viaVariant == viaJson)
  }

  test("top_k_pairs works through plain SQL (extension registration)") {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_tk")
    val n = spark.sql(
      """SELECT o_custkey, top_k_pairs(o_totalprice, o_orderkey, 2) AS tk
        |FROM orders_tk GROUP BY o_custkey""".stripMargin)
      .select(col("o_custkey"), explode(col("tk")))
      .count()
    val groups = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    // every group yields min(2, group size) rows; all sf groups have >=2
    assert(n >= groups)
  }

  test("distributed running total equals the single-task global window") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").cast("bigint").as("v"))
    val viaOp = graft.operators.CumSum
      .runningTotal(o, "v", "cum", Seq(col("o_orderkey").asc))
      .select("o_orderkey", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("o_orderkey")
      .rowsBetween(Long.MinValue, 0)
    val viaWindow = o.withColumn("cum", sum("v").over(w))
      .select("o_orderkey", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaOp == viaWindow)
  }

  test("exclusive running max equals the exclusive window; partition-invariant") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_orderkey") % 97).cast("bigint").as("v"))
    def maxes(df: org.apache.spark.sql.DataFrame) = {
      val (withM, spent) = graft.operators.CumMax
        .runningMaxExclusive(df, "v", "m", Seq(col("o_orderkey").asc))
      val out = withM.select("o_orderkey", "m").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      spent.unpersist()
      out
    }
    val viaOp = maxes(o)
    val w = org.apache.spark.sql.expressions.Window.orderBy("o_orderkey")
      .rowsBetween(Long.MinValue, -1)
    val viaWindow = o
      .withColumn("m", coalesce(max("v").over(w), lit(Long.MinValue)))
      .select("o_orderkey", "m").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaOp == viaWindow)
    assert(maxes(o.repartition(3)) == maxes(o.repartition(17)))
  }

  test("skyline: planted frontier with equal-price and equal-point ties") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sky").toString
    // (10.0, 5) frontier; (10.0, 5) duplicate point — BOTH survive
    // (neither strictly dominates); (10.0, 3) dominated by same-price
    // larger; (12.0, 5) dominated by cheaper equal-size; (15.0, 9)
    // frontier; (20.0, 9) dominated; (25.0, 12) frontier
    Seq((1L, "a", 10.0, 5), (2L, "b", 10.0, 5), (3L, "c", 10.0, 3),
      (4L, "d", 12.0, 5), (5L, "e", 15.0, 9), (6L, "f", 20.0, 9),
      (7L, "g", 25.0, 12))
      .toDF("p_partkey", "p_name", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = SparkEntry.queries("q_skyline")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 10.0, 5L), (2L, 10.0, 5L), (5L, 15.0, 9L),
      (7L, 25.0, 12L)))
  }

  test("running total is invariant to the input's partitioning") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), lit(1L).as("v"))
    def cums(df: org.apache.spark.sql.DataFrame) = graft.operators.CumSum
      .runningTotal(df, "v", "cum", Seq(col("o_orderkey").asc))
      .select("o_orderkey", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cums(o.repartition(3)) == cums(o.repartition(17)))
  }

  test("corpus curation: dup texts keep the lowest id, budget cuts worst-quality-first") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (7L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the old river bank today"), // dup, lower id wins
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // no stopwords: high quality
      (9L, "the the the the the the the the the the")) // degenerate: low ttr, all stopwords
      .toDF("doc_id", "text")
    val markers = Seq("the", "a", "of", "and", "to")
    val all = graft.operators.CorpusCuration
      .curate(docs, markers, minQuality = 0.0, tokenBudget = 1000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(all.keySet == Set(3L, 5L, 9L), s"dedup kept ${all.keySet}")
    assert(!all.contains(7L), "first-seen-wins must keep the LOWEST doc id")
    assert(all(5L) > all(9L), "stopword-free text must outscore degenerate text")
    // a budget that fits only the best doc selects exactly it
    val cut = graft.operators.CorpusCuration
      .curate(docs, markers, minQuality = 0.0, tokenBudget = 10L)
      .collect().map(_.getLong(0)).toSet
    assert(cut == Set(5L), s"10-token budget should keep only the best doc, got $cut")
  }

  test("rrfFuse: both-list hits outrank single-list, missing side scores 0, id tie-break") {
    import spark.implicits._
    // doc 10 ranks 1st in both lists; 20 only lexical (rank 2); 30 only
    // vector (rank 2) — 20 and 30 tie on rrf, id breaks it
    val lex = Seq((10L, 1L), (20L, 2L)).toDF("id", "rnk")
    val vec = Seq((10L, 1L), (30L, 2L)).toDF("id", "rnk")
    val out = graft.operators.HybridSearch
      .rrfFuse(Seq("lex" -> lex, "vec" -> vec), "id", "rnk", k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("rrf"), r.getAs[Long]("rnk")))
    assert(out.map(_._1).toSeq == Seq(10L, 20L, 30L))
    assert(out(0)._2 > out(1)._2, "two-list consensus must outscore one list")
    assert(out(1)._2 == out(2)._2, "equal single-list ranks tie on rrf")
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L))
  }

  test("blockPairJoin meets every unordered pair exactly once") {
    import org.apache.spark.sql.functions._
    // n deliberately NOT a multiple of the block count, ids offset so
    // blocks are unevenly filled — exercises same-block id-order pairs
    // AND both cross-block arrangements (lesser id in higher block)
    val n = 37
    val e = spark.range(100, 100 + n).toDF("vec_id")
      .withColumn("embedding", array(col("vec_id").cast("float")))
    val got = graft.queries.Extensions
      .blockPairJoin(e, "vec_id", "embedding", blocks = 5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = (for {
      a <- 100L until (100L + n); b <- (a + 1) until (100L + n)
    } yield (a, b)).toSeq
    assert(got.size == expected.size, s"duplicate or lost pairs: ${got.size} vs ${expected.size}")
    assert(got.toSet == expected.toSet)
    assert(got.forall { case (a, b) => a < b })
  }

  test("bucketed blockPairJoin meets pairs only within a bucket, once per bucket") {
    import org.apache.spark.sql.functions._
    // ids 0-11 split into two buckets; id 6 sits in BOTH (the top-2-cell
    // multi-assignment shape) — its pairs against bucket-0 rows and
    // bucket-1 rows must each appear exactly once, cross-bucket pairs never
    import spark.implicits._
    val rows = (0L to 5L).map(i => (i, 0)) ++ (6L to 11L).map(i => (i, 1)) :+ (6L, 0)
    val e = rows.toDF("vec_id", "cell")
      .withColumn("embedding", array(col("vec_id").cast("float")))
    val got = graft.queries.Extensions
      .blockPairJoin(e, "vec_id", "embedding", blocks = 3, bucketCols = Seq("cell"))
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b0 = (0L to 6L).toSeq
    val b1 = (6L to 11L).toSeq
    val expected = (for { a <- b0; b <- b0 if a < b } yield (a, b)) ++
      (for { a <- b1; b <- b1 if a < b } yield (a, b))
    assert(got.size == expected.size, s"got ${got.size} vs ${expected.size}")
    assert(got.toSet == expected.toSet)
    assert(got.count { case (a, b) => a < 6 && b > 6 } == 0, "cross-bucket pair leaked")
  }

  test("incremental embed dedup: replay-stable, stored-wins params, torn-index rejection") {
    import graft.operators.IncrementalEmbedDedup
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("embdedup").toFile
    try {
      graft.functions.VectorExpressions.register(spark)
      val base = Tables.embeddings(spark, sf)
      val batch = graft.queries.Extensions.plantedNearDupCorpus(base)
        .filter(col("vec_id") >= 10000000L)
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // founding ingest: model committed, zero pairs
      assert(IncrementalEmbedDedup.ingest(spark, dir.getPath,
        base.select("vec_id", "embedding"), "vec_id", "embedding",
        k = 8, assignCells = 2).isEmpty)
      assert(new java.io.File(dir, "_model").exists(),
        "model must be committed at the founding ingest")
      val first = pairSet(IncrementalEmbedDedup.ingest(
        spark, dir.getPath, batch, "vec_id", "embedding"))
      assert(first.nonEmpty, "planted copies must match their originals")
      // crash-replay: the batch's cell rows are already in the index —
      // the same ingest must return the same history pairs, not leak
      // batch-internal ones; a DIFFERENT caller k must be ignored
      // (stored model wins)
      val replay = pairSet(IncrementalEmbedDedup.ingest(
        spark, dir.getPath, batch, "vec_id", "embedding", k = 3))
      assert(replay == first, "replayed ingest must be pair-stable")
      // torn index: data partitions without _model are rejected
      assert(new java.io.File(dir, "_model").delete())
      val e = intercept[RuntimeException] {
        IncrementalEmbedDedup.ingest(spark, dir.getPath, batch,
          "vec_id", "embedding")
      }
      assert(e.getMessage.contains("torn"), e.getMessage)
    } finally LocalFs.rmrf(dir)
  }

  test("embedding-ANN dedup recovers the planted near-dup pairs exactly") {
    val exact = graft.queries.Extensions.exactEmbedNearDupPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth of the planting: one (original, original+10M) pair per
    // vec_id % 5 == 0 row, and NOTHING else crosses the 0.8 threshold
    val plantedIds = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 5 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(exact == plantedIds.map(i => (i, i + 10000000L)),
      "exact pair set must be exactly the planted copies")
    val ann = pairs("q_dedup_embed_ann")
    assert(ann.subsetOf(exact), s"false positives: ${ann -- exact}")
    val recall = exact.count(ann.contains).toDouble / exact.size
    info(f"ANN dedup recall $recall%.3f over ${exact.size} planted pairs")
    assert(recall >= 0.95, s"ANN dedup recall $recall")
  }

  test("canonical selection keeps exactly the best-quality doc per cluster") {
    val rows = SparkEntry.queries("q_dedup_canonical")(spark, sf).collect()
    assert(rows.nonEmpty, "expected planted near-dup clusters in testdata")
    rows.groupBy(_.getLong(0)).foreach { case (cid, members) =>
      assert(members.length >= 2, s"cluster $cid: clusters come from pairs")
      val keepers = members.filter(_.getBoolean(3))
      assert(keepers.length == 1, s"cluster $cid: one keeper, got ${keepers.length}")
      // keeper = argmax quality, doc_id tie-break
      val best = members.maxBy(r => (r.getDouble(2), -r.getLong(1)))
      assert(keepers.head.getLong(1) == best.getLong(1),
        s"cluster $cid kept ${keepers.head.getLong(1)}, best is ${best.getLong(1)}")
    }
    // membership and labels agree with the clustering key exactly
    val clusters = SparkEntry.queries("q_dedup_cluster")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(1), r.getLong(0))).toSet == clusters,
      "canonical output must cover exactly the clustered docs")
  }

  test("quality rules: per-rule attribution isolates the failing signal") {
    import spark.implicits._
    val markers = Seq("the", "a", "of", "and", "to")
    val good = (1 to 50).map(i => s"item$i").mkString(" ") +
      " the a of and to item51"
    val degenerate = Seq.fill(40)("spam").mkString(" ") // ttr+topf+stop fail
    val noStops = (1 to 60).map(i => s"wordy$i").mkString(" ")
    val short = "the a of and to the a of and to" // len+awl+topf fail
    val out = graft.operators.QualityRules
      .evaluate(Seq((1L, good), (2L, degenerate), (3L, noStops), (4L, short))
        .toDF("doc_id", "text"), markers)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getLong(7), r.getBoolean(8))).toMap
    assert(out(1L) == ((true, true, true, true, true, 5L, true)))
    assert(out(2L) == ((true, true, false, false, false, 2L, false)))
    assert(out(3L) == ((true, true, false, true, true, 4L, false)))
    assert(out(4L) == ((false, false, true, true, false, 2L, false)))
  }

  test("quality rules over the corpus: consistent aggregates, no degenerate rule") {
    val rows = SparkEntry.queries("q_quality_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (2 to 6).map(r.getBoolean)
      assert(r.getLong(7) == flags.count(identity), s"n_passed mismatch: $r")
      assert(r.getBoolean(8) == flags.forall(identity), s"pass mismatch: $r")
    }
    // every rule must discriminate on the real corpus (thresholds are
    // tuned to be non-degenerate at this SF — see QualityRules.Config)
    (2 to 6).foreach { i =>
      val passed = rows.count(_.getBoolean(i))
      assert(passed > 0 && passed < rows.length,
        s"rule at column $i is degenerate: $passed/${rows.length}")
    }
  }

  test("q_entity_resolution: clusters are transitive closures of d<=2 pairs with min-canonical golden records") {
    val rows = SparkEntry.queries("q_entity_resolution")(spark, sf).collect()
    assert(rows.nonEmpty, "expected name variants in testdata")
    val memberToCanonical = rows.flatMap { r =>
      val canonical = r.getString(0)
      val members = r.getString(4).split('|').toSeq
      assert(members.size == r.getLong(1), s"n_names mismatch: $r")
      assert(members.size >= 2, s"singleton cluster leaked: $r")
      assert(members == members.sorted, s"members not sorted: $r")
      assert(canonical == members.min, s"canonical must be cluster min: $r")
      assert(r.getLong(2) >= r.getLong(1), s"n_parts < n_names: $r")
      members.map(_ -> canonical)
    }.toMap
    // no name in two clusters (flatMap->toMap would mask it; check sizes)
    assert(memberToCanonical.size ==
      rows.map(_.getLong(1)).sum, "a name appears in two clusters")
    // independent pair derivation: every d<=2 pair must land in ONE cluster
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0))
    for (a <- names; b <- names if a < b) {
      val d = levenshteinDist(a, b)
      if (d <= 2)
        assert(memberToCanonical.get(a).exists(memberToCanonical.get(b).contains),
          s"pair ($a, $b) at distance $d split across clusters")
    }
  }

  test("segment blocking plans as a hash equi-join on segment content, never a nested loop") {
    import spark.implicits._
    val df = (1 to 50).map(i => f"name-$i%04d").toDF("n")
    val pairs = operators.FuzzyBlocking.segmentPairs(
      df.select(col("n").as("a")), df.select(col("n").as("b")), 2)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      plan.linesIterator.take(15).mkString("\n"))
    // adjacent numeric ids differ by 1-2 substitutions: the planted
    // uniform-length pair set must actually be found
    val got = pairs.filter(col("a") < col("b")).count()
    assert(got > 0, "uniform-length vocabulary must still yield pairs")
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
