package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (test scope): run the dedup family against an
  * arbitrary documents dir — typically a deliberately duplicate-heavy
  * corpus — to observe the capped-bucket designs under duplicate
  * blow-up. Usage:
  *
  *   sbt "Test/runMain graft.ScaleProbe /path/with/documents.parquet"
  *
  * (Each doc duplicated k times makes every LSH bucket a k-clique; the
  * BucketCap guard is what keeps pair generation bounded.)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale_probe")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
    }
    if (args.lift(1).contains("--ann")) {
      // ANN probe: expand the dir's embeddings corpus k× (plain copies
      // with fresh vec_ids — throughput probe, recall is pinned by
      // AnnRecallSpec at fixture scale) and time the three ANN paths.
      // What this measures at scale: all three are linear per query, but
      // q50 pays a 512-byte cosine per corpus row, q52 pays a 32-byte
      // Hamming per row + C exact cosines, q51 scans ~Probes/NumCentroids
      // of the corpus after the (3-pass) training cost.
      import org.apache.spark.sql.functions._
      val k = args.lift(2).map(_.toInt).getOrElse(10)
      val probeDir = s"/tmp/ann_probe_$k"
      val src = Tables(spark, dir, "embeddings")
      // copies occupy id blocks ABOVE the originals so vec_id<5 queries
      // and vec_id<8 centroid seeds stay the original distinct vectors
      val n = src.count()
      src.select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(k - 1))).as("i"))
        .select((col("vec_id") + col("i") * n).as("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(s"$probeDir/embeddings.parquet")
      Seq("q50_ann_brute", "q51_ann_ivf", "q52_ann_lsh").foreach { q =>
        time(s"$q@${k}x")(queries.Catalog.all(q).build(spark, probeDir).count())
      }
    } else if (args.lift(1).contains("--bucket")) {
      // Mega-bucket A/B: the LSH bucket-truncation stage in isolation,
      // bounded-heap aggregate (graft_collect_capped) vs the
      // compositional form it replaced. `buckets` hot buckets × `k`
      // members, each member carrying a q41-shaped 100-shingle payload;
      // cap = BucketCap. The composed form materializes k structs per
      // aggregation buffer before slicing; the bounded form never holds
      // more than cap — the difference IS the 100 TB mega-bucket risk.
      import org.apache.spark.sql.functions._
      val buckets = args.lift(2).map(_.toInt).getOrElse(32)
      val k = args.lift(3).map(_.toInt).getOrElse(100000)
      val cap = queries.Dedup.BucketCap
      val df = spark.range(buckets.toLong * k).select(
          (col("id") % buckets).cast("int").as("band"),
          (col("id") % buckets).cast("string").as("bsig"),
          col("id").as("doc_id"),
          transform(sequence(lit(0), lit(99)),
            i => concat(lit("shingle_"), col("id") % 50, lit("_"), i)).as("sh"))
        .repartition(32)
      def stage(agg: org.apache.spark.sql.Column): Long = df
        .groupBy(col("band"), col("bsig")).agg(agg.as("ids"))
        .select(col("band"), size(col("ids")).as("n")).agg(sum("n")).head.getLong(0)
      // bounded first: at large k the composed form OOMs the JVM (that
      // crash is the measurement — don't let it eat the bounded number)
      time(s"bounded graft_collect_capped   ${buckets}x$k")(
        stage(call_function("graft_collect_capped",
          struct(col("doc_id"), col("sh")), lit(cap))))
      time(s"composed sort_array(collect_list) ${buckets}x$k")(
        stage(slice(sort_array(collect_list(struct(col("doc_id"), col("sh")))), 1, cap)))
    } else if (args.lift(1).contains("--span")) {
      // q123 duplication probe: k× plain copies of the corpus (fresh
      // ids). Window rows grow k× and every span's corpus count
      // multiplies by k, so the h-partitioned window groups grow k× too.
      // The property probed: cost stays ~linear in k — the one (h,
      // doc_id) shuffle is the only row-count-bearing stage, and
      // WindowExec's group buffering over a k×-hot span spills rather
      // than blows. A super-linear trend here would mean the count
      // stage re-derives windows per consumer (the groupBy+self-join
      // regression PlanSpec pins against).
      import org.apache.spark.sql.functions._
      val k = args.lift(2).map(_.toInt).getOrElse(8)
      val src = Tables(spark, dir, "documents")
      val n = src.count()
      time(s"q123_span_dup@1x")(
        queries.Catalog.all("q123_span_dup").build(spark, dir).count())
      val probeDir = s"/tmp/span_probe_$k"
      src.select(col("doc_id"), col("text"), col("source"),
          explode(sequence(lit(0), lit(k - 1))).as("i"))
        .select((col("doc_id") + col("i") * n).as("doc_id"),
          col("text"), col("source"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$probeDir/documents.parquet")
      time(s"q123_span_dup@${k}x")(
        queries.Catalog.all("q123_span_dup").build(spark, probeDir).count())
    } else if (args.lift(1).contains("--semdedup")) {
      // q124 growth probe: k× corpus copies with UNCHANGED NumCentroids.
      // Every cluster's population grows k×, so the cluster-local
      // pairwise stage grows k² — this probe MEASURES the documented
      // Σ|c|² cost contract instead of asserting it. The mitigation is
      // in the q124 scaladoc: k must scale with the corpus so |c| stays
      // bounded; the near-quadratic trend printed here is the evidence
      // for why that isn't optional. (Copies sit in id blocks above the
      // originals so the vec_id<NumCentroids seeds stay distinct.)
      import org.apache.spark.sql.functions._
      val ks = args.lift(2).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 4))
      val src = Tables(spark, dir, "embeddings")
      val n = src.count()
      time(s"q124_semdedup@1x")(
        queries.Catalog.all("q124_semdedup").build(spark, dir).count())
      ks.foreach { k =>
        val probeDir = s"/tmp/semdedup_probe_$k"
        src.select(col("vec_id"), col("embedding"), col("label"),
            explode(sequence(lit(0), lit(k - 1))).as("i"))
          .select((col("vec_id") + col("i") * n).as("vec_id"),
            col("embedding"), col("label"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$probeDir/embeddings.parquet")
        time(s"q124_semdedup@${k}x")(
          queries.Catalog.all("q124_semdedup").build(spark, probeDir).count())
      }
    } else if (args.lift(1).contains("--cc")) {
      // Connected-components probe: an n-node chain is the adversarial
      // diameter case for q101. The r6 propagation-only loop re-evaluated
      // rounds 1..k−1 inside round k (per-round cost GREW); the
      // checkpointed loop + star escalation keeps per-round cost flat
      // and round count O(log n) — the per-round prints are the evidence.
      import org.apache.spark.sql.functions._
      val n = args.lift(2).map(_.toInt).getOrElse(200000)
      val chain = spark.range(1, n.toLong)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        .repartition(32)
      time(s"q101 clusterPairs chain n=$n")(
        queries.Dedup.clusterPairsInstrumented(chain, 20, 4,
          (name, sec) => println(f"  round $name%-14s $sec%6.2f s")).count())
    } else if (args.lift(1).contains("--overlap")) {
      // q110 worst case: EVERY shingle of a long shared run appears in
      // ALL S sources, so each emits S(S-1)/2 pair rows. The probe shows
      // the pair rows collapsing in the map-side partial count (the
      // output grain is C(S,2), not shingles × C(S,2)). The design bound
      // to know: per-task hash-agg state is ≤ C(#sources, 2) pair keys —
      // fine at mixture-planning source counts (tens-hundreds); at many
      // thousands of sources switch to sampled per-shingle estimation.
      import org.apache.spark.sql.functions._
      val s2 = args.lift(2).map(_.toInt).getOrElse(100)   // sources
      val d2 = args.lift(3).map(_.toInt).getOrElse(200)   // docs per source
      val sharedRun = 600                                  // tokens shared by all
      val probeDir = s"/tmp/overlap_probe_$s2"
      val shared = (0 until sharedRun).map(i => lit(s"shared$i"))
      val srcToks = (0 until 5).map(j =>
        concat(lit("s"), col("id") % s2, lit("_t"), lit(j)))
      spark.range(s2.toLong * d2).select(
          col("id").as("doc_id"),
          concat_ws(" ", (shared ++ srcToks :+
            concat(lit("u"), col("id"))): _*).as("text"),
          lit("en").as("lang"),
          concat(lit("src"), col("id") % s2).as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$probeDir/documents.parquet")
      time(s"q110_source_overlap S=$s2 D=$d2 shared=$sharedRun")(
        queries.Catalog.all("q110_source_overlap").build(spark, probeDir).count())
    } else if (args.lift(1).contains("--bpe")) {
      // BPE growth probe: fit wall-time and driver round-trips as the
      // merge count M doubles, batched (top-64 window) vs sequential
      // (batch=1). The properties probed: per-merge cost FALLS with M
      // (the corpus scan amortizes over vocab-grain rounds — cost is
      // corpus + M·vocab, not M·corpus) and batched trips grow
      // sublinearly in M (one trip accepts an exactness-proven disjoint
      // prefix). The printed trend is the evidence behind the q130
      // "sub-linear in M" claim.
      val ms = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(8, 16, 32))
      // sequential cross-check only at small M: M sequential rounds is M
      // driver trips of pure job-scheduling latency (minutes at M=256
      // regardless of data size); the batched argmax's exactness is
      // PROVEN by TextKernelSpec's disjoint-prefix induction and
      // re-verified empirically here up to the cap
      val seqCheckMax = args.lift(3).map(_.toInt).getOrElse(64)
      // `gen`: synthesize a corpus with a DEEP merge supply — the
      // fixture vocabulary runs dry at ~89 merges, far below production
      // merge counts. 997 distinct 12-hex-char words over a 16-symbol
      // alphabet sustain hundreds of rounds; the fit cost model under
      // test (corpus scanned once, rounds at vocab grain) is exactly
      // the same, just exercised at real M.
      val useDir = if (args.contains("gen")) {
        import org.apache.spark.sql.functions._
        val g = "/tmp/bpe_gen"
        spark.range(5000).select(col("id").as("doc_id"),
            concat_ws(" ", (0 until 40).map(p =>
              substring(md5((((col("id") * 40 + p) * (col("id") + p + 7))
                % 997).cast("string")), 1, 12)): _*).as("text"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$g/documents.parquet")
        g
      } else dir
      ms.foreach { m =>
        val t0 = System.nanoTime()
        val (mergesB, tripsB) =
          queries.TextAnalysis.bpeFitBatched(spark, useDir, m, queries.TextAnalysis.BpeBatch)
        val tB = (System.nanoTime() - t0) / 1e9
        val seq = if (m <= seqCheckMax) {
          val t1 = System.nanoTime()
          val (mergesS, tripsS) = queries.TextAnalysis.bpeFitBatched(spark, useDir, m, 1)
          val tS = (System.nanoTime() - t1) / 1e9
          require(mergesB == mergesS, s"batched != sequential at M=$m")
          f"sequential: $tS%5.1f s / $tripsS trips   "
        } else "sequential: skipped (> cross-check cap)   "
        val learned = mergesB.length // < m ⇒ the corpus pair supply ran dry
        // window scaled WITH M: the fixed top-[[BpeBatch]] window accepts
        // a ~constant merges-per-trip prefix (trips linear in M, slope
        // ~0.4); a width-M window lets the verified disjoint prefix grow
        // with M — the production setting for 10k-merge tokenizers
        val t2 = System.nanoTime()
        val (mergesW, tripsW) =
          queries.TextAnalysis.bpeFitBatched(spark, useDir, m, m)
        val tW = (System.nanoTime() - t2) / 1e9
        require(mergesW == mergesB, s"width-M batched != width-64 batched at M=$m")
        println(f"bpe M=$m%-3d learned=$learned%-3d batched(w=64): $tB%5.1f s / $tripsB trips   " +
          f"batched(w=M): $tW%5.1f s / $tripsW trips   " + seq +
          f"(per-merge w=M ${tW / learned * 1000}%4.0f ms)")
      }
    } else if (args.lift(1).contains("--triangles")) {
      // Triangle-census probe: synthetic k-regular-ish graphs at growing
      // vertex counts with degree FIXED (the kNN contract: deg ≤ 2·KnnK).
      // The property probed: wall-time grows ~linearly in |V| — the
      // wedge join emits ≤ Σdeg² = d²·|V| rows, so doubling vertices at
      // fixed degree doubles cost. Super-linear growth would mean the
      // census lost the canonical-edge bound and is re-deriving wedges
      // per closing probe. Each vertex connects to its d/2 successors
      // (ring lattice — triangle-rich, like a kNN graph's local cliques).
      import org.apache.spark.sql.functions._
      val ns = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(100000, 200000, 400000))
      val d = args.lift(3).map(_.toInt).getOrElse(16) // ring half-degree
      ns.foreach { n =>
        val und = spark.range(n.toLong).select(col("id").as("a"),
            explode(sequence(lit(1), lit(d))).as("i"))
          .filter(col("a") + col("i") < n) // open chain: keeps a < b canonical
          .select(col("a"), (col("a") + col("i")).as("b"))
          .repartition(32)
        time(f"triangleStats |V|=$n%-7d deg<=${2 * d}")(
          queries.Similarity.triangleStats(und).agg(sum("n_tri")).head.getLong(0))
      }
    } else if (args.lift(1).contains("--dau")) {
      // q162 growth probe: k× event copies with k× disjoint user-id
      // blocks (fresh event_ids too). The property probed: wall-time
      // ~linear in events — the (day, user) distinct collapses the
      // corpus FIRST, so the ×7 coverage explode and both distinct
      // shuffles scale with user-days, not raw events. Super-linear
      // growth would mean the explode moved above the collapse.
      import org.apache.spark.sql.functions._
      val ks = args.lift(2).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 4, 8))
      val src = Tables(spark, dir, "events")
      val n = src.count()
      time(s"q162_active_users@1x")(
        queries.Catalog.all("q162_active_users").build(spark, dir).count())
      ks.foreach { k =>
        val probeDir = s"/tmp/dau_probe_$k"
        src.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            col("value"), col("props"), explode(sequence(lit(0), lit(k - 1))).as("i"))
          .select((col("event_id") + col("i") * n).as("event_id"), col("ts"),
            (col("user_id") + col("i") * 100000L).as("user_id"),
            col("event_type"), col("value"), col("props"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$probeDir/events.parquet")
        time(s"q162_active_users@${k}x")(
          queries.Catalog.all("q162_active_users").build(spark, probeDir).count())
      }
    } else if (args.lift(1).contains("--skew")) {
      // Join-skew probe (round-10): a planted hot key owning 50% of the
      // fact rows, joined to a 100k-key dim too big to broadcast
      // comfortably. Three variants timed: plain SMJ (AQE skew split
      // OFF — the hot reducer is the wall), AQE skew-join ON (runtime
      // split), and the salted rewrite (SkewJoin.saltedJoin). Also
      // prints the reducer-load distribution before/after salting —
      // the hot task IS the 100 TB failure mode, wall-time at probe
      // scale only hints at it.
      import org.apache.spark.sql.functions._
      val n = args.lift(2).map(_.toInt).getOrElse(4000000)
      val keys = 100000
      val fact = spark.range(n.toLong).select(
          when(col("id") % 2 === 0, 0L)
            .otherwise(pmod(xxhash64(col("id")), lit(keys - 1)) + 1).as("k"),
          col("id").as("uid"), (col("id") % 97).cast("double").as("v"))
        .repartition(32)
      val dim2 = spark.range(keys.toLong).select(col("id").as("k"),
        concat(lit("g"), col("id") % 7).as("grp")).repartition(32)
      def agg(j: org.apache.spark.sql.DataFrame): Long =
        j.groupBy(col("grp")).agg(count(lit(1)).as("cnt")).count()
      def withConf(kvs: (String, String)*)(f: => Unit): Unit = {
        val prev = kvs.map { case (key, _) => key -> spark.conf.get(key) }
        kvs.foreach { case (key, v) => spark.conf.set(key, v) }
        try f finally prev.foreach { case (key, v) => spark.conf.set(key, v) }
      }
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        time(s"plain SMJ (skew split off) n=$n")(agg(fact.join(dim2, Seq("k"))))
      }
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB") {
        time(s"AQE skew-join split      n=$n")(agg(fact.join(dim2, Seq("k"))))
      }
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        time(s"salted join (8 shards)   n=$n")(
          agg(operators.SkewJoin.saltedJoin(fact, dim2, "k", "uid", 8)))
      }
      def shares(parted: org.apache.spark.sql.DataFrame): (Double, Double) = {
        val sizes = parted.groupBy(spark_partition_id().as("p"))
          .agg(count(lit(1)).as("n")).collect().map(_.getAs[Long]("n"))
        (sizes.max.toDouble / sizes.sum, sizes.sum.toDouble / sizes.length / sizes.sum)
      }
      val (bMax, bMean) = shares(fact.repartition(32, col("k")))
      val (aMax, aMean) = shares(fact
        .withColumn("__salt", pmod(xxhash64(col("uid")), lit(8)).cast("int"))
        .repartition(32, col("k"), col("__salt")))
      println(f"reducer load: unsalted max ${bMax * 100}%.1f%% (mean ${bMean * 100}%.1f%%)" +
        f" -> salted max ${aMax * 100}%.1f%% (mean ${aMean * 100}%.1f%%)")
    } else if (args.lift(1).contains("--diameter")) {
      // q101/q139 closure-diameter stress (round-10): a chain of D
      // near-dup links — window vectors with EXACT cosine (w−k)/w, so
      // the ≥τ graph derived by the real top-k search is precisely a
      // diameter-D chain (ClosureDiameterSpec pins the D=32 cluster
      // result). Properties probed: round count grows ~log₂D after the
      // star-contraction escalation (propagation alone needs D rounds
      // on a chain) and per-round cost is flat.
      import org.apache.spark.sql.functions._
      val ds = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(32, 64, 128))
      val w = 3 // cos(v_i, v_{i+1}) = 2/3 ≥ τ(0.45); skip-2 = 1/3 < τ
      ds.foreach { dD =>
        val dim = dD + w + 1
        val rows = (0 to dD).map { i =>
          (i.toLong, (0 until dim).map(j =>
            if (j >= i && j < i + w) 1.0 / math.sqrt(w) else 0.0))
        }
        val corpus = spark.createDataFrame(rows).toDF("vec_id", "v")
          .repartition(32)
        val edges = queries.Similarity.searchTopK(spark, corpus,
          corpus.select(col("vec_id").as("q_id"), col("v").as("qv")), 4)
        val pairs = edges.filter(col("cos") >= queries.Similarity.SemDedupTau &&
            col("q_id") =!= col("n_id"))
          .select(least(col("q_id"), col("n_id")).as("doc_a"),
            greatest(col("q_id"), col("n_id")).as("doc_b"))
          .distinct()
        var rounds = 0
        time(f"closure chain D=$dD%-4d")(
          queries.Dedup.clusterPairsInstrumented(pairs, 24, 4,
            (name, sec) => { rounds += 1
              println(f"  round $name%-14s $sec%6.2f s") }).count())
        println(f"  D=$dD%-4d rounds=$rounds  (log2 D ≈ " +
          f"${(math.log(dD.toDouble) / math.log(2)).round})")
      }
    } else if (args.lift(1).contains("--bucketgate")) {
      // On-disk recurrence probe (round-10): per-batch cost of the two
      // incremental gates against a BUCKETED corpus artifact as the
      // corpus grows k×, batch held FIXED. BucketedGateSpec pins the
      // plan property (no Exchange/Sort on the corpus side); this
      // measures its consequence — per-batch cost grows only at
      // columnar-SCAN rate, not shuffle rate. Growth blocks are
      // md5-mangled (every token distinct from the originals), so the
      // batch's candidate/verify work is IDENTICAL at every k and the
      // trend isolates pure index-size cost. The sorted-scan conf
      // matches the writeBucketed contract (one file per bucket).
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val ks = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(1, 4, 16))
      val src = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      val n = src.count()
      val base = src.filter(col("doc_id") % 10 < 8)
      val batch = src.filter(col("doc_id") % 10 >= 8)
      def mangled(i: Int) = base.select(
        (col("doc_id") + lit(i.toLong) * n).as("doc_id"),
        concat_ws(" ", (1 to 5).map(j =>
          md5(concat(col("text"), lit(s"#$i#$j")))): _*).as("text"))
      ks.foreach { k =>
        val corpusK = (base +: (1 until k).map(mangled)).reduce(_ unionByName _)
        // fit (untimed): the persisted artifacts production computes once
        sinks.CorpusSink.writeBucketed(
          corpusK.select(sha2(col("text"), 256).as("h")).distinct(),
          s"bg_digests_$k", s"/tmp/bucketgate_${k}_digests", Seq("h"), 32)
        sinks.CorpusSink.writeBucketed(
          queries.Dedup.bandIndex(spark, corpusK, queries.Dedup.BucketCap),
          s"bg_bands_$k", s"/tmp/bucketgate_${k}_bands", Seq("band", "bsig"), 32)
        // merge hint: at probe scale the planner would broadcast the
        // index and hide the bucketed-SMJ path that matters at 100 TB
        time(f"q97  digest gate  corpus=${k}%2dx")(
          queries.Pipeline.exactDedupGate(batch,
            spark.table(s"bg_digests_$k").hint("merge")).count())
        time(f"q106 fuzzy gate   corpus=${k}%2dx")(
          queries.Dedup.fuzzyProbe(spark, batch,
            spark.table(s"bg_bands_$k").hint("merge")).count())
      }
      ks.foreach { k =>
        spark.sql(s"DROP TABLE IF EXISTS bg_digests_$k")
        spark.sql(s"DROP TABLE IF EXISTS bg_bands_$k")
      }
    } else if (args.lift(1).contains("--conc")) {
      // q166/q167 growth probe: k× event copies with k× disjoint user
      // blocks (the --dau construction). The property probed: both
      // verbs' cost tracks the corpus HASH-AGG, not the statistic —
      // the count-of-counts table stays at distinct-activity-level
      // grain (constant here: copied users repeat the same activity
      // profile), so the sorted-cumulative window cost is FLAT while
      // events grow k×. Super-linear growth would mean the window
      // slipped below the collapse.
      import org.apache.spark.sql.functions._
      val ks = args.lift(2).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(16, 64))
      val src = Tables(spark, dir, "events")
      val n = src.count()
      Seq("q166_activity_gini", "q167_activity_outliers").foreach { q =>
        time(s"$q@1x")(queries.Catalog.all(q).build(spark, dir).count())
      }
      ks.foreach { k =>
        val probeDir = s"/tmp/conc_probe_$k"
        src.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            col("value"), col("props"), explode(sequence(lit(0), lit(k - 1))).as("i"))
          .select((col("event_id") + col("i") * n).as("event_id"), col("ts"),
            (col("user_id") + col("i") * 100000L).as("user_id"),
            col("event_type"), col("value"), col("props"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$probeDir/events.parquet")
        Seq("q166_activity_gini", "q167_activity_outliers").foreach { q =>
          time(s"$q@${k}x")(queries.Catalog.all(q).build(spark, probeDir).count())
        }
      }
    } else if (args.lift(1).contains("--attr")) {
      // q168/q171 growth probe: k× event copies with k× disjoint user
      // blocks (the --dau construction). The property probed: both
      // attribution verbs scale ~linearly in events — q168 is one
      // user-partitioned window (state ∝ one user's events), q171's
      // purchase×touch pair join fans out per purchase only within one
      // user's 24 h lookback, so copied users add pairs linearly.
      // Super-linear growth would mean the pair join escaped the
      // user/lookback bound.
      import org.apache.spark.sql.functions._
      val ks = args.lift(2).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(16, 64))
      val src = Tables(spark, dir, "events")
      val n = src.count()
      Seq("q168_conversion_attribution", "q171_linear_attribution").foreach { q =>
        time(s"$q@1x")(queries.Catalog.all(q).build(spark, dir).count())
      }
      ks.foreach { k =>
        val probeDir = s"/tmp/attr_probe_$k"
        src.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            col("value"), col("props"), explode(sequence(lit(0), lit(k - 1))).as("i"))
          .select((col("event_id") + col("i") * n).as("event_id"), col("ts"),
            (col("user_id") + col("i") * 100000L).as("user_id"),
            col("event_type"), col("value"), col("props"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$probeDir/events.parquet")
        Seq("q168_conversion_attribution", "q171_linear_attribution").foreach { q =>
          time(s"$q@${k}x")(queries.Catalog.all(q).build(spark, probeDir).count())
        }
      }
      // hot-user worst case: ONE bot user with k·5000 events all inside
      // a single 24 h span — q171's per-user pair fan-out is quadratic
      // in that user's touch density (purchases × touches: ~k²·2M
      // pairs here), while q168's single window pass stays linear and
      // q171b's bounded heap collapses each purchase's candidates to
      // ≤ AttrTouchCap rows BEFORE the p_id shuffle (the shipped
      // mitigation — round-11 verdict #6). The pair census prints both
      // volumes: `pairs` grows ~k², `kept/purchase` stays pinned at the
      // cap — the flat-volume proof.
      Seq(2, 4, 8).foreach { k =>
        val probeDir = s"/tmp/attr_hot_$k"
        val hot = src.limit(5000)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            col("value"), col("props"), explode(sequence(lit(0), lit(k - 1))).as("i"))
          .select((col("event_id") + col("i") * 5000L).as("event_id"),
            // squeeze every copy's events into one day for user 0
            expr("timestamp_micros(CAST(1704067200000000 + ((event_id + i * 5000) % 86400) * 1000000 AS BIGINT))").as("ts"),
            lit(0L).as("user_id"), col("event_type"), col("value"), col("props"))
        hot.repartition(32).write.mode("overwrite").parquet(s"$probeDir/events.parquet")
        Seq("q168_conversion_attribution", "q171_linear_attribution",
            "q171b_capped_attribution").foreach { q =>
          time(s"$q@hot${k}x")(queries.Catalog.all(q).build(spark, probeDir).count())
        }
        // pair census: uncapped pair volume vs heap-kept rows
        val ev = Tables(spark, probeDir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("p_us"), col("event_id").as("p_id"))
        val tou = ev.filter(col("event_type").isin(queries.Windowed.AttrTouch: _*))
          .select(col("user_id"), col("us").as("t_us"), col("event_id").as("t_id"))
        val pairs = pur.join(tou, Seq("user_id"))
          .filter((col("t_us") < col("p_us") ||
            (col("t_us") === col("p_us") && col("t_id") < col("p_id"))) &&
            col("p_us") - col("t_us") <= queries.Windowed.AttrWindowUs)
        val perP = pairs.groupBy(col("p_id")).count()
        val row = perP.agg(sum(col("count")).as("pairs"),
          sum(least(col("count"), lit(queries.Windowed.AttrTouchCap.toLong)))
            .as("kept"), count(lit(1)).as("purchases")).first()
        println(f"hot${k}x pair census: pairs=${row.getLong(0)}%,d " +
          f"kept=${row.getLong(1)}%,d purchases=${row.getLong(2)}%,d " +
          f"kept/purchase=${row.getLong(1).toDouble / row.getLong(2)}%.2f " +
          f"(cap=${queries.Windowed.AttrTouchCap})")
      }
    } else if (args.lift(1).contains("--rank")) {
      // PageRank round-cost probe: per-round seconds at a deeper
      // iteration count than the catalog's 3. The property probed:
      // per-round cost is FLAT (each round's rank table is eagerly
      // localCheckpoint-ed, so round k re-evaluates one join+aggregate,
      // never the k-deep lineage chain — the clusterPairs rule). A
      // growing per-round trend here means the truncation regressed.
      val iters = args.lift(2).map(_.toInt).getOrElse(12)
      val t0 = System.nanoTime()
      val n = queries.Similarity.pageRank(spark, dir, iters,
        (k, sec) => println(f"rank round $k%2d: $sec%5.2f s")).count()
      println(f"pageRank iters=$iters total ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
    } else {
      time("q41_minhash_capped")(
        queries.Dedup.minhashPairs(spark, dir, queries.Dedup.BucketCap).count())
      time("q43_ngram_hashed")(
        queries.Dedup.ngramJaccard(spark, dir, queries.Dedup.DfCap).count())
      time("q45_simhash_banded")(
        queries.Catalog.all("q45_simhash_hamming").build(spark, dir).count())
      time("q106_fuzzy_incremental")(
        queries.Dedup.fuzzyIncremental(spark, dir, queries.Dedup.BucketCap).count())
    }
    spark.stop()
  }
}
