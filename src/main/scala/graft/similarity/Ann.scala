package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2 L6–L7).
  *
  * Scale design (SURVEY §5): the query set is small and broadcast; the
  * corpus is never collected. Brute force is the exact baseline
  * (broadcast-join + per-group top-k via window, which Spark executes
  * with rank-limit pushdown); the LSH variant bounds candidates by
  * random-hyperplane sign buckets so corpus×query work drops from
  * O(N·Q) to O(candidates).
  */
object Ann {

  /** Exact top-k neighbors per query: broadcast queries × corpus,
    * rank by rounded cosine (desc) with id tie-break. */
  /** Scoring is compute-bound — spread the corpus across all cores even
    * when it arrives as one small file split. */
  private def scatter(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Per-label centroids (L20): mean embedding per label as
    * (label, pos, n, centroid) rows — per-dimension means over a
    * posexplode, i.e. one linear partial-agg shuffle on (label, pos);
    * label×dim output, never a per-vector collect. Values are rounded
    * to 6dp and summed as exact DECIMAL so the mean is order-independent
    * and engine-portable (float summation is neither). The data-mix /
    * drift primitive: compare corpus slices by centroid distance. */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "__x")))
      .select(col("label"), col("pos"),
        round(col("__x").cast("double"), 6).cast("decimal(18,6)").as("__xd"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"),
        (sum(col("__xd")) * 1000000).cast("long").as("__s"))
      // 6dp mean via EXACT integer micros: engines' double round()
      // disagrees on near-tie quotients (hit once at sf0.1) — integer
      // half-away-from-zero division is bit-identical everywhere
      .withColumn("__m", signum(col("__s")).cast("long") *
        expr("(2 * abs(__s) + n) div (2 * n)"))
      .select(col("label"), col("pos"), col("n"),
        (col("__m").cast("double") / 1000000.0).as("centroid"))

  /** Exact-rerank tail shared by every ANN variant: rank candidates
    * (q_id, n_id, cosine) by (cosine desc, n_id) per query, keep top k. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cosine")
  }

  def topKBruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5): DataFrame = {
    val c = scatter(corpus).select(col("vec_id").as("n_id"), Vectors.toDouble(col("embedding")).as("__vc"))
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cosine", Vectors.cosine6(col("__vq"), col("__vc")))
    rankTopK(scored, k)
  }

  /** Deterministic pseudo-random hyperplanes (LCG, fixed seed — no
    * runtime randomness, so plans are reproducible across runs/executors). */
  private def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var state = 42L
    def nextUnit(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(nPlanes, dim)(nextUnit())
  }

  private def bucketOf(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val d = Vectors.dot(v, typedLit(p.toSeq))
      when(d >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed top-k (the scale path): sign-bucket the corpus once;
    * each broadcast query multi-probes its own bucket plus every 1-bit
    * flip (nPlanes+1 buckets), candidates are reranked exactly. Work per
    * query is (nPlanes+1)/2^nPlanes of the corpus instead of all of it;
    * rank quality within candidates is exact, recall grows with probes. */
  def topKLsh(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nPlanes: Int = 4,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val c = scatter(corpus).select(col("vec_id").as("n_id"), Vectors.toDouble(col("embedding")).as("__vc"))
      .withColumn("__bk", bucketOf(col("__vc"), planes))
    val base = bucketOf(col("__vq"), planes)
    val probes = array((base +: (0 until nPlanes).map(j => base.bitwiseXOR(lit(1L << j)))): _*)
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__bkq", explode(probes))
    val scored = c.join(broadcast(q), col("__bk") === col("__bkq") && col("q_id") =!= col("n_id"))
      .withColumn("cosine", Vectors.cosine6(col("__vq"), col("__vc")))
    rankTopK(scored, k)
  }

  /** Engine-PORTABLE sign-LSH twin (L7b of the A14b/L3b md5 idiom): the
    * same bucket-and-multiprobe shape as [[topKLsh]], re-derived so
    * every bucketing ingredient exists verbatim in ANSI SQL and is
    * bit-exact across engines:
    *
    *  - hyperplane components are ±1 (Rademacher planes — a valid
    *    sign-LSH family) from the PARITY of the first hex digit of
    *    md5("plane,dim"), which both engines compute identically;
    *  - the sign decision is an exact INTEGER sum: each coordinate
    *    enters as floor(v_i · 2^20) (power-of-two scaling of a float32
    *    is exact in double, floor is deterministic), so no
    *    float-summation order exists anywhere in the bucket key — a
    *    near-zero double dot product could otherwise flip sign between
    *    engines' fold orders;
    *  - rerank is the oracle-proven [[Vectors.cosine6]].
    *
    * This converts sign-LSH candidate generation from rows-only to
    * hash-verified against DuckDB; [[topKLsh]] (codegen'd double dot
    * against LCG planes) stays the cheaper scale path. */
  def topKLshPortable(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nPlanes: Int = 4,
      dim: Int = 64): DataFrame = {
    def comp(j: Int, i: Column): Column =
      when(conv(substring(md5(concat_ws(",", lit(j.toString), i.cast("string"))), 1, 1), 16, 10)
        .cast("long") % 2 === 1, lit(1L)).otherwise(lit(-1L))
    def bucketOf(v: Column): Column =
      (0 until nPlanes).map { j =>
        val s = aggregate(sequence(lit(0), lit(dim - 1)), lit(0L),
          (acc, i) => acc + comp(j, i) * floor(element_at(v, i + 1) * 1048576).cast("long"))
        when(s >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val c = scatter(corpus).select(col("vec_id").as("n_id"), Vectors.toDouble(col("embedding")).as("__vc"))
      .withColumn("__bk", bucketOf(col("__vc")))
    val base = bucketOf(col("__vq"))
    val probes = array((base +: (0 until nPlanes).map(j => base.bitwiseXOR(lit(1L << j)))): _*)
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__bkq", explode(probes))
    val scored = c.join(broadcast(q), col("__bk") === col("__bkq") && col("q_id") =!= col("n_id"))
      .withColumn("cosine", Vectors.cosine6(col("__vq"), col("__vc")))
    rankTopK(scored, k)
  }

  /** Long inner product of two integer-scaled vectors — exact, and
    * order-independent (integer addition is associative), so any engine
    * computing it over the same values gets the same long. Native
    * codegen'd expression (r7 cont.): the composed HOF form ran
    * interpreted in every (row × seed) distance of the fixed-point
    * paths; [[dotLComposed]] stays as the spec's equivalence
    * reference. */
  private def dotL(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.dotLong(a, b)

  private[graft] def dotLComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)

  /** Engine-PORTABLE IVF twin (L7d of the A14b/L3b/L7b md5 idiom): the
    * same assign → probe → exact-rerank shape as [[topKIvf]], re-derived
    * so the quantizer and every distance exist verbatim in ANSI SQL and
    * are bit-exact across engines:
    *
    *  - the coarse quantizer is the `nCentroids` corpus vectors with the
    *    smallest (md5(vec_id), vec_id) — a deterministic hash-sampled
    *    quantizer. Sampling without Lloyd refinement is still a valid
    *    IVF coarse quantizer (faiss trains on exactly such a sample; the
    *    portable twin skips the refinement so "training" is ONE ORDER BY
    *    both engines evaluate identically), it just partitions space a
    *    little less evenly — recall/cost, not correctness;
    *  - assignment and probing use exact INTEGER squared distances over
    *    floor(v_i · 2^20) coordinates via |a|² + |b|² − 2·a·b. Every
    *    term is ≤ 2^48, exactly representable as long AND as an
    *    integer-valued double, and integer sums are order-independent —
    *    no float-summation tie can flip an argmin between engines. Ties
    *    break on the smaller centroid id in both engines;
    *  - rerank is the oracle-proven [[Vectors.cosine6]].
    *
    * This converts IVF candidate generation from rows-only to
    * hash-verified against DuckDB; [[topKIvf]] (Lloyd-trained quantizer,
    * double distances) stays the quality/scale path. */
  private def intVec(v: Column): Column =
    graft.plans.GraftFunctions.floorScale(v, 1048576L)

  /** The composed form, kept as the native [[graft.plans.FloorScale]]
    * expression's equivalence witness (PlansSpec). */
  private[graft] def intVecComposed(v: Column): Column =
    transform(v, x => floor(x * 1048576).cast("long"))

  /** The portable quantizer's seeds: the `nCentroids` corpus vectors
    * with the smallest (md5(vec_id), vec_id), as integer-scaled
    * coordinates. Bounded model input: nCentroids × dim longs on the
    * driver — the same size contract as the trained quantizer's collect. */
  private def portableSeeds(corpus: DataFrame, nCentroids: Int): Array[Array[Long]] =
    corpus
      .select(col("vec_id"), intVec(Vectors.toDouble(col("embedding"))).as("__vi"))
      .withColumn("__h", md5(col("vec_id").cast("string")))
      .orderBy(col("__h"), col("vec_id")).limit(nCentroids)
      .select("__vi").collect().map(_.getSeq[Long](0).toArray)

  /** Exact integer squared distances to every seed, as one array column. */
  private def intDists(vi: Column, seeds: Array[Array[Long]]): Column = {
    val seedSelfIp: Array[Long] = seeds.map(s => s.map(x => x * x).sum)
    val selfIp = dotL(vi, vi)
    array(seeds.indices.map { i =>
      selfIp + lit(seedSelfIp(i)) - lit(2L) * dotL(vi, typedLit(seeds(i).toSeq))
    }: _*)
  }

  /** Portable cluster assignment — every corpus vector to the id of its
    * nearest hash-sampled seed (ties to the smaller id) by exact integer
    * distance: (vec_id, cl) rows, bit-identical in any engine. The
    * shared front half of [[topKIvfPortable]], and the embedding-space
    * partitioner the diversity sampler (L31) stratifies over. */
  def portableAssignments(corpus: DataFrame, nCentroids: Int = 16): DataFrame =
    portableAssignmentsDetailed(corpus, nCentroids).select("vec_id", "cl")

  /** [[portableAssignments]] plus the exact integer squared distance to
    * the assigned seed (`__dc`) and the double vector (`__v`) — the
    * front half the semantic deduplicator (L34) scopes its
    * within-cluster pair search and keep rule with. Same determinism
    * contract: every value exists verbatim in ANSI SQL. */
  def portableAssignmentsDetailed(corpus: DataFrame, nCentroids: Int = 16): DataFrame = {
    val seeds = portableSeeds(corpus, nCentroids)
    scatter(corpus)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("__v"))
      .withColumn("__d", intDists(intVec(col("__v")), seeds))
      // first index attaining the integer min — ties to the smaller cl
      .select(col("vec_id"), col("__v"),
        (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int").as("cl"),
        array_min(col("__d")).as("__dc"))
  }

  /** L63: IVF list-balance report — the skew diagnostic you read BEFORE
    * trusting an IVF index at scale: per coarse cell, the list size,
    * its corpus share, and a balance factor (n·K/total in micros — 10⁶
    * is perfectly balanced; a cell at 8×10⁶ holds 8× its fair share,
    * so probes hitting it rerank 8× the vectors and the index's
    * speedup claim collapses on exactly the hot queries). Cells the
    * quantizer never fills report n = 0 — wasted probe budget. Built
    * on the portable assignment, so every number re-derives in ANSI
    * SQL. One map-side-combined aggregate over the assignment; the
    * K-row totals cross-join is broadcast. */
  def indexStats(corpus: DataFrame, nCentroids: Int = 16): DataFrame = {
    val lists = portableAssignments(corpus, nCentroids)
      .groupBy("cl").agg(count(lit(1)).as("n_vectors"))
    val tot = lists.agg(sum(col("n_vectors")).as("__t"))
    corpus.sparkSession.range(0, nCentroids)
      .select(col("id").cast("int").as("cl"))
      .join(lists, Seq("cl"), "left")
      .crossJoin(broadcast(tot))
      .select(col("cl"), coalesce(col("n_vectors"), lit(0L)).as("n_vectors"),
        col("__t"))
      .select(col("cl"), col("n_vectors"),
        expr("n_vectors * 1000000 div __t").as("share_micros"),
        expr(s"n_vectors * ${nCentroids * 1000000L} div __t").as("balance_micros"))
      .orderBy("cl")
  }

  /** L66: cluster GEOMETRIC quality — [[indexStats]]'s companion: per
    * coarse cell, the mean and max exact-integer squared distance to
    * the assigned seed (inertia per cell — the elbow-curve data that
    * says whether K is too small before anyone trusts the partitioning
    * for IVF or SemDeDup scoping). The per-vector distance is already
    * exact integer (`__dc`); the sum accumulates in DECIMAL(38,0) so a
    * billion-vector cell cannot overflow the intermediate, and only
    * the BIGINT-safe mean/max are emitted. One map-side-combined
    * aggregate over the assignment. */
  def clusterQuality(corpus: DataFrame, nCentroids: Int = 16): DataFrame =
    portableAssignmentsDetailed(corpus, nCentroids)
      .groupBy("cl")
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("__dc").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__sse"),
        max(col("__dc")).as("max_sse"))
      .select(col("cl"), col("n_vectors"),
        expr("__sse div n_vectors").cast("long").as("mean_sse"),
        col("max_sse"))
      .orderBy("cl")

  /** Assignment of `corpus` under FIXED integer seeds — the persisted-
    * index form of [[portableAssignments]] (the quantizer comes from a
    * stored table, not from re-sampling the corpus). */
  private def assignUnderSeeds(corpus: DataFrame, seeds: Array[Array[Long]]): DataFrame =
    scatter(corpus)
      .select(col("vec_id"), intVec(Vectors.toDouble(col("embedding"))).as("__vi"))
      .withColumn("__d", intDists(col("__vi"), seeds))
      .select(col("vec_id"),
        (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int").as("cl"))

  /** Persist a PORTABLE IVF index (the L7c layout with L7d arithmetic —
    * VERDICT r7 #4): hash-sampled integer seeds in `<name>_centroids`
    * ((cl, pos, xi) BIGINT rows — exact at rest, no float round-trip)
    * plus every vector's exact-integer-distance assignment in the
    * vec_id-PK bucketed `<name>_assign`. Because the seeds are the
    * nCentroids smallest-(md5(vec_id), vec_id) corpus vectors and every
    * distance is exact integer arithmetic, BOTH index tables re-derive
    * verbatim in ANSI SQL — the indexed search is hash-verifiable
    * end-to-end, stored tables included. [[saveIndex]] (Lloyd quantizer)
    * stays the quality path. */
  def saveIndexPortable(
      spark: org.apache.spark.sql.SparkSession,
      store: graft.store.TableStore,
      name: String,
      corpus: DataFrame,
      nCentroids: Int = 16,
      assignBuckets: Int = 8): Unit = {
    import spark.implicits._
    val seeds = portableSeeds(corpus, nCentroids)
    require(seeds.nonEmpty,
      "saveIndexPortable: empty corpus — no vectors to seed the quantizer from")
    val rows = seeds.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (x, p) => (c, p, x) } }.toSeq
    if (!store.exists(s"${name}_centroids")) {
      store.createTable(s"${name}_centroids",
        Seq("cl" -> "int", "pos" -> "int", "xi" -> "bigint"), Seq("cl", "pos"))
      store.insert(s"${name}_centroids", rows.toDF("cl", "pos", "xi"))
    } else store.merge(s"${name}_centroids", rows.toDF("cl", "pos", "xi"))
    if (!store.exists(s"${name}_assign")) {
      store.createTable(s"${name}_assign",
        Seq("vec_id" -> "bigint", "cl" -> "int"), Seq("vec_id"), buckets = assignBuckets)
      store.insert(s"${name}_assign", assignUnderSeeds(corpus, seeds))
    } else store.merge(s"${name}_assign", assignUnderSeeds(corpus, seeds))
  }

  /** Load persisted integer seeds back — exact (BIGINT at rest). */
  def loadPortableSeeds(store: graft.store.TableStore, table: String): Array[Array[Long]] =
    store.readTable(table, orderBy = Seq("cl", "pos")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_._2).map(_._3).toArray }.toArray

  /** faiss add() for the portable index: assign ONLY `newVectors` under
    * the PERSISTED seeds and upsert — no retrain, stored lists stay
    * valid, cost O(new vectors). */
  def growIndexPortable(
      store: graft.store.TableStore,
      name: String,
      newVectors: DataFrame): Unit =
    store.upsert(s"${name}_assign",
      assignUnderSeeds(newVectors, loadPortableSeeds(store, s"${name}_centroids")))

  /** IVF top-k over the PERSISTED portable index: inverted lists from
    * the assignment table (co-keyed join, no corpus-wide assign scan),
    * probing by exact integer distance to the stored seeds, exact
    * cosine rerank. Identical results to [[topKIvfPortable]] built on
    * the same save/grow corpus (spec-pinned) — and, unlike the Lloyd
    * path, the whole answer is DuckDB-oracle-exact. */
  def topKIvfIndexedPortable(
      store: graft.store.TableStore,
      name: String,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val seeds = loadPortableSeeds(store, s"${name}_centroids")
    val assign = store.readTable(s"${name}_assign")
    val c = scatter(corpus)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("__vc"))
      .join(assign.select(col("vec_id"), col("cl").as("__cl")), "vec_id")
      .select(col("vec_id").as("n_id"), col("__vc"), col("__cl"))
    val probeIds = {
      val d = intDists(intVec(col("__vq")), seeds)
      val idx = transform(typedLit(seeds.indices.toList),
        i => struct(element_at(d, i + 1).as("d"), i.as("i")))
      slice(transform(array_sort(idx), s => s.getField("i")), 1, nProbe)
    }
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__cl", explode(probeIds))
    val scored = c.join(broadcast(q), Seq("__cl"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", Vectors.cosine6(col("__vq"), col("__vc")))
    rankTopK(scored, k)
  }

  /** Distributed full-corpus k-means training (L49) — Lloyd's algorithm
    * where EVERY iteration is a distributed pass over the whole corpus,
    * unlike [[trainIvfCentroids]]'s bounded driver-side sample. This is
    * the "cluster 100 TB of embeddings" operator (quantizer training on
    * the full distribution, SemDeDup/diverse-sampling partitioning, the
    * k-means step of IVF index builds at corpus scale): the corpus never
    * leaves the executors; the only driver traffic per iteration is the
    * k×dim model (the scalar/model-collect class SURVEY §5 allows).
    *
    * Engine-portable by the L7d fixed-point contract, so the whole
    * unrolled iteration is expressible in ANSI SQL and the driver query
    * is hash-exact vs DuckDB:
    *  - init: the k smallest (md5(vec_id), vec_id) corpus vectors as
    *    floor(x·2^20) integer coordinates ([[portableSeeds]]);
    *  - assignment: exact integer squared distances ([[intDists]]),
    *    first-minimum tie-break to the smaller cluster id;
    *  - update: per-(cluster, position) integer coordinate sums (ONE
    *    map-side-combined shuffle per iteration, k×dim reducer rows),
    *    new centroid = half-away-from-zero integer division — the
    *    labelCentroids discipline, still in the 2^20 scale so the next
    *    iteration's distances stay exact longs;
    *  - empty clusters keep their previous centroid (the in-memory
    *    [[lloyd]] contract).
    *
    * The FINAL iteration's aggregate is returned as the result — it
    * never round-trips the driver: (cl, pos, n, centroid) with
    * `centroid = c / 2^20` (a power-of-two division, exact in double)
    * and `n` the cluster size that produced it. Clusters empty in the
    * final assignment emit no rows, matching the SQL form. */
  def kmeansTrain(corpus: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(iters >= 1, "kmeansTrain needs at least one Lloyd iteration")
    var cents: Array[Array[Long]] = portableSeeds(corpus, k)
    val ints = scatter(corpus)
      .select(col("vec_id"), intVec(Vectors.toDouble(col("embedding"))).as("__vi"))
    def stats(c: Array[Array[Long]]): DataFrame =
      ints
        .withColumn("__d", intDists(col("__vi"), c))
        // first index attaining the integer min — ties to the smaller cl
        .select((array_position(col("__d"), array_min(col("__d"))) - 1).cast("int").as("cl"),
          col("__vi"))
        .select(col("cl"), posexplode(col("__vi")).as(Seq("pos", "__x")))
        .groupBy("cl", "pos")
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("n"))
        .withColumn("__c", signum(col("__s")).cast("long") *
          expr("(2 * abs(__s) + n) div (2 * n)"))
    for (_ <- 1 until iters) {
      val updated = stats(cents).select("cl", "pos", "__c").collect()
      val next = cents.map(_.clone()) // empty clusters keep their centroid
      updated.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      cents = next
    }
    stats(cents)
      .select(col("cl"), col("pos"), col("n"),
        (col("__c").cast("double") / 1048576.0).as("centroid"))
      .orderBy("cl", "pos")
  }

  /** Collect a [[kmeansTrain]] result into the dense centroid model the
    * IVF searchers accept — the bridge from full-corpus training (L49)
    * to index serving (L7b/L7c): k×dim doubles, the same bounded model
    * contract as [[trainIvfCentroids]]'s output, but learned from the
    * WHOLE corpus instead of a driver-side sample. Clusters empty in
    * the final assignment (absent rows) drop; survivors keep cluster
    * order. */
  def kmeansCentroids(trained: DataFrame): Seq[Seq[Double]] = {
    val rows = trained.select("cl", "pos", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, ps) => ps.sortBy(_._2).map(_._3).toIndexedSeq }
  }

  def topKIvfPortable(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val seeds = portableSeeds(corpus, nCentroids)
    val c = scatter(corpus)
      .select(col("vec_id").as("n_id"), Vectors.toDouble(col("embedding")).as("__vc"))
      .withColumn("__d", intDists(intVec(col("__vc")), seeds))
      // first index attaining the integer min — ties to the smaller cl
      .withColumn("__cl", (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .drop("__d")
    val probeIds = {
      val d = intDists(intVec(col("__vq")), seeds)
      val idx = transform(typedLit(seeds.indices.toList),
        i => struct(element_at(d, i + 1).as("d"), i.as("i")))
      slice(transform(array_sort(idx), s => s.getField("i")), 1, nProbe)
    }
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__cl", explode(probeIds))
    val scored = c.join(broadcast(q), Seq("__cl"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", Vectors.cosine6(col("__vq"), col("__vc")))
    rankTopK(scored, k)
  }

  /** L61: ANN recall evaluation — the harness that tells you whether an
    * approximate index is GOOD ENOUGH to replace the brute-force scan
    * before you flip 100 TB of retrieval onto it: per query,
    * recall@k of [[topKIvfPortable]] against the [[topKBruteForce]]
    * ground truth over the same query set (the faiss-bench protocol).
    * recall_micros is the exact integer floor(hits·10⁶ / k_truth), so
    * the whole report — both retrieval paths included — re-derives in
    * ANSI SQL.
    *
    * Scale: evaluation runs over a SAMPLED query set (both paths
    * broadcast only queries); the ground-truth brute-force pass is the
    * one corpus-scale scan per run you pay for the measurement, which
    * is the point — you pay it once offline, not per serving query.
    * The hit join is keyed (q_id, n_id): ≤ k rows per query per side. */
  def annRecall(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame =
    recallAgainstTruth(
      topKBruteForce(corpus, queries, k),
      topKIvfPortable(corpus, queries, k, nCentroids, nProbe))

  /** L61b: PQ recall — the quantization-loss half of the evaluation
    * story [[annRecall]] starts: how much recall@k the m-byte ADC
    * codes cost against exact cosine ground truth (IVF loses recall by
    * NOT VISITING neighbors; PQ by MIS-RANKING them — a deployment
    * gates on both numbers). Portable path, so the measurement
    * re-derives in ANSI SQL like L61's. */
  def annRecallPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      m: Int = 4,
      ksub: Int = 8): DataFrame =
    recallAgainstTruth(
      topKBruteForce(corpus, queries, k),
      topKPqPortable(corpus, queries, k, m, ksub))

  private def recallAgainstTruth(truthTopK: DataFrame, approxTopK: DataFrame): DataFrame =
    truthTopK.select(col("q_id"), col("n_id"))
      .join(approxTopK.select(col("q_id"), col("n_id"), lit(1L).as("__hit")),
        Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("k_hit"))
      .select(col("q_id"), col("k_truth"), col("k_hit"),
        expr("k_hit * 1000000 div k_truth").as("recall_micros"))
      .orderBy("q_id")

  /** Squared euclidean distance to each centroid (literal array),
    * evaluated as one expression per row. */
  private def distances(v: Column, cents: Seq[Seq[Double]]): Column =
    transform(typedLit(cents), c =>
      aggregate(zip_with(v, c, (a, b) => (a - b) * (a - b)), lit(0.0), (acc, d) => acc + d))

  /** Corpus-side quantizer assignment — the native codegen'd argmin
    * (graft.plans.NearestCentroid): the composed
    * array_position(array_min(distances)) stack is CodegenFallback and
    * this runs once per ingested vector. Bit-identical incl. the
    * first-min tie-break (pinned in PlansSpec). */
  private def nearestCluster(v: Column, cents: Seq[Seq[Double]]): Column =
    graft.plans.GraftFunctions.nearestCentroid(v, cents)

  /** The composed form, kept as the native expression's equivalence
    * reference in PlansSpec. */
  private[graft] def nearestClusterComposed(v: Column, cents: Seq[Seq[Double]]): Column = {
    val d = distances(v, cents)
    // first index attaining the min → deterministic tie-break
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** IVF coarse quantizer: Lloyd's k-means over a deterministic
    * bounded hash-sample of the corpus, computed on the driver —
    * the faiss-style train-on-sample design. Quantizer quality depends
    * on SAMPLE size, not corpus coverage, so `maxTrainRows` makes
    * training cost independent of corpus size: ONE distributed job
    * collects the hash-ordered sample (≤ maxTrainRows×dim doubles,
    * ~32 MB at the defaults — the size-bounded model input, the only
    * deliberate driver-side compute in the engine), then Lloyd runs in
    * memory with zero per-iteration job/codegen overhead (measured: 5
    * distributed iterations cost ~4 s in scheduling alone for a
    * sub-MB sample).
    *
    * Deterministic: the sample and the seeds are the smallest
    * xxhash64(vec_id) rows, assignment tie-breaks on the first minimal
    * centroid, and per-position means are rounded to 6 dp per
    * iteration — same contract as the previous distributed trainer. */
  def trainIvfCentroids(
      corpus: DataFrame,
      nCentroids: Int,
      iters: Int = 5,
      maxTrainRows: Int = 65536): Seq[Seq[Double]] = {
    val sample = trainSample(corpus, maxTrainRows)
    if (sample.isEmpty) Nil
    else lloyd(sample, nCentroids, iters).map(_.toIndexedSeq).toIndexedSeq
  }

  /** The deterministic bounded training sample every driver-side trainer
    * shares: the `maxTrainRows` smallest xxhash64(vec_id) vectors. */
  private def trainSample(corpus: DataFrame, maxTrainRows: Int): Array[Array[Double]] =
    scatter(corpus)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("__v"))
      .orderBy(xxhash64(col("vec_id"))).limit(maxTrainRows)
      .select("__v").collect().map(_.getSeq[Double](0).toArray)

  /** In-memory Lloyd with the deterministic contract the distributed
    * trainer had: seeds = first k sample rows, first-min tie-break,
    * per-position means rounded to 6 dp each iteration, empty clusters
    * keep their previous centroid. */
  private def lloyd(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = sample.take(k).map(_.clone())
    val dim = cents.head.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length, dim)(0.0)
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        for (ci <- cents.indices) {
          var d = 0.0
          var j = 0
          while (j < dim) { val t = v(j) - cents(ci)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = ci }
        }
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        counts(best) += 1
      }
      // empty clusters keep their previous centroid
      cents = cents.indices.map { ci =>
        if (counts(ci) == 0) cents(ci)
        else Array.tabulate(dim)(j =>
          BigDecimal(sums(ci)(j) / counts(ci)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toArray
    }
    cents
  }

  /** Persist a trained quantizer in a managed store table as
    * (cl, pos, x) rows — C×dim model-sized data, so training is
    * amortized across sessions, not just calls. Round-trips exactly
    * (doubles stored as SQL float = DoubleType). */
  def saveCentroids(
      spark: org.apache.spark.sql.SparkSession,
      store: graft.store.TableStore,
      table: String,
      cents: Seq[Seq[Double]]): Unit = {
    import spark.implicits._
    val rows = cents.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (x, p) => (c, p, x) }
    }
    // rebuild-friendly: a retrain REPLACES the stored quantizer (full
    // merge deletes stale rows) instead of throwing TableAlreadyExists
    if (!store.exists(table)) {
      store.createTable(table, Seq("cl" -> "int", "pos" -> "int", "x" -> "float"), Seq("cl", "pos"))
      store.insert(table, rows.toDF("cl", "pos", "x"))
    } else store.merge(table, rows.toDF("cl", "pos", "x"))
  }

  def loadCentroids(store: graft.store.TableStore, table: String): Seq[Seq[Double]] =
    store.readTable(table, orderBy = Seq("cl", "pos")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_._2).map(_._3).toIndexedSeq }

  /** Per-vector inverted-list assignments for a trained quantizer. */
  private def assignments(corpus: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    scatter(corpus).select(col("vec_id"),
      nearestCluster(Vectors.toDouble(col("embedding")), cents).as("cl"))

  /** Persist a FULL IVF index (L7c): the quantizer (`<name>_centroids`)
    * plus every vector's inverted-list assignment (`<name>_assign`, a
    * vec_id-PK bucketed store table). Centroids alone amortize training;
    * persisting the assignments amortizes the corpus-wide
    * nearest-centroid scan too — the expensive half at 100 TB. Corpus
    * growth is INCREMENTAL via [[growIndex]]: only the new vectors are
    * assigned and upserted, and the store's bucket pruning rewrites only
    * the buckets their keys land in. */
  def saveIndex(
      spark: org.apache.spark.sql.SparkSession,
      store: graft.store.TableStore,
      name: String,
      corpus: DataFrame,
      nCentroids: Int = 16,
      iters: Int = 5,
      maxTrainRows: Int = 65536,
      assignBuckets: Int = 8): Seq[Seq[Double]] = {
    val cents = trainIvfCentroids(corpus, nCentroids, iters, maxTrainRows)
    saveCentroids(spark, store, s"${name}_centroids", cents)
    // same rebuild semantics as the quantizer: re-running saveIndex
    // replaces the assignment lists wholesale
    if (!store.exists(s"${name}_assign")) {
      store.createTable(s"${name}_assign",
        Seq("vec_id" -> "bigint", "cl" -> "int"), Seq("vec_id"), buckets = assignBuckets)
      store.insert(s"${name}_assign", assignments(corpus, cents))
    } else store.merge(s"${name}_assign", assignments(corpus, cents))
    cents
  }

  /** Assign ONLY `newVectors` against the persisted quantizer and upsert
    * them into the assignment table — the quantizer is NOT retrained
    * (the faiss add() contract), so existing lists stay valid and the
    * cost is O(new vectors). Re-sent vec_ids are re-assigned idempotently. */
  def growIndex(
      store: graft.store.TableStore,
      name: String,
      newVectors: DataFrame): Unit = {
    val cents = loadCentroids(store, s"${name}_centroids")
    store.upsert(s"${name}_assign", assignments(newVectors, cents))
  }

  /** IVF top-k over a PERSISTED index: inverted lists come from the
    * assignment table (one co-keyed join on vec_id instead of a
    * corpus-wide nearest-centroid scan); probing and exact rerank as in
    * [[topKIvf]]. Results are identical to topKIvf run with the same
    * centroids (spec-pinned). */
  def topKIvfIndexed(
      store: graft.store.TableStore,
      name: String,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val cents = loadCentroids(store, s"${name}_centroids")
    val assign = store.readTable(s"${name}_assign")
    val c = scatter(corpus)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("__vc"))
      .join(assign.select(col("vec_id"), col("cl").as("__cl")), "vec_id")
      .select(col("vec_id").as("n_id"), col("__vc"), col("__cl"))
    probeAndRerank(c, queries, cents, k, nProbe)
  }

  /** IVF top-k (the second scale path next to sign-LSH): assign the
    * corpus to its nearest centroid once; each broadcast query probes
    * its `nProbe` nearest inverted lists and reranks exactly. Work per
    * query ≈ nProbe/nCentroids of the corpus; recall grows with nProbe
    * (nProbe = nCentroids degrades gracefully to exact brute force). */
  def topKIvf(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      iters: Int = 5,
      maxTrainRows: Int = 65536,
      centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    // a quantizer trained once (trainIvfCentroids) can be reused across
    // query batches — at 100 TB training is amortized, not per-call
    val cents = centroids.getOrElse(trainIvfCentroids(corpus, nCentroids, iters, maxTrainRows))
    val c = scatter(corpus)
      .select(col("vec_id").as("n_id"), Vectors.toDouble(col("embedding")).as("__vc"))
      .withColumn("__cl", nearestCluster(col("__vc"), cents))
    probeAndRerank(c, queries, cents, k, nProbe)
  }

  /** Shared probe + exact-rerank tail of the IVF variants: each
    * broadcast query probes its nProbe nearest inverted lists, candidates
    * rerank by exact rounded cosine with id tie-break. `c` is the
    * assigned corpus (n_id, __vc, __cl). */
  private def probeAndRerank(
      c: DataFrame,
      queries: DataFrame,
      cents: Seq[Seq[Double]],
      k: Int,
      nProbe: Int): DataFrame = {
    // query → its nProbe nearest centroid ids, exploded into probes
    val probeIds = {
      val d = distances(col("__vq"), cents)
      val idx = transform(typedLit(cents.indices.toList), i => struct(element_at(d, i + 1).as("d"), i.as("i")))
      slice(transform(array_sort(idx), s => s.getField("i")), 1, nProbe)
    }
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__cl", explode(probeIds))
    val scored = c.join(broadcast(q), Seq("__cl"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", Vectors.cosine6(col("__vq"), col("__vc")))
    rankTopK(scored, k)
  }

  /** L39: per-vector symmetric int8 quantization + reconstruction-error
    * report — the storage-tier transform an embedding corpus wants at
    * 100 TB (4× smaller than float32). scale = max|x|/127; code_i =
    * round-half-away(x_i/scale) clamped to ±127 (round() on doubles is
    * half-away in both Spark and DuckDB, over identical IEEE quotients,
    * so the codes are engine-exact). Pure scan-riding array algebra
    * (transform + array_max + aggregate), no shuffle but the output
    * sort; `q_sum` is an exact integer checksum of the code vector and
    * `max_abs_err` the reconstruction bound. All-zero vectors take
    * scale 0 with zero codes and zero error. */
  // ── L43: product quantization (PQ / IVF-PQ — the billion-vector
  // compression path: m sub-codebooks of ksub centroids turn a dim-D
  // float vector into m small codes; search scores candidates with an
  // asymmetric-distance (ADC) table computed ONCE per query, so the
  // per-candidate cost is m array lookups + adds instead of a dim-D
  // dot product, and the corpus storage drops ~(4·dim)/m bytes→m) ──

  /** Subvector j (0-based) of an m-way split: dims [j·dsub, (j+1)·dsub). */
  private def subVec(v: Column, j: Int, dsub: Int): Column =
    slice(v, j * dsub + 1, dsub)

  /** Per-subspace Lloyd codebooks over the shared deterministic hash
    * sample (one distributed job for the sample; m in-memory Lloyd runs
    * on the driver — model-sized compute, same contract as
    * [[trainIvfCentroids]]). Returns m × ksub × (dim/m). */
  def trainPqCodebooks(
      corpus: DataFrame,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 5,
      maxTrainRows: Int = 65536): Seq[Seq[Seq[Double]]] = {
    val sample = trainSample(corpus, maxTrainRows)
    if (sample.isEmpty) return Nil
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val dsub = dim / m
    (0 until m).map { j =>
      val sub = sample.map(v => v.slice(j * dsub, (j + 1) * dsub))
      lloyd(sub, ksub, iters).map(_.toIndexedSeq).toIndexedSeq
    }
  }

  /** Encode every corpus vector as m sub-codes — one scan, codegen'd
    * per-subspace argmin (the native NearestCentroid kernel), no
    * shuffle. The 100 TB storage transform: this is what an ADC search
    * scans instead of the float corpus. */
  def pqEncode(corpus: DataFrame, books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val dsub = books.head.head.length
    val v = Vectors.toDouble(col("embedding"))
    val codes = array(books.indices.map(j =>
      nearestCluster(subVec(v, j, dsub), books(j))): _*)
    scatter(corpus).select(col("vec_id"), codes.as("codes"))
  }

  /** ADC score: Σ_j table[j][codes[j]] — m lookups into the query's
    * per-subspace distance table. */
  private def adcScore(codes: Column, table: Column, m: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(m - 1)),
        j => element_at(element_at(table, j + 1), element_at(codes, j + 1) + 1)),
      lit(0.0), (a, x) => a + x)

  /** PQ top-k (full-scan ADC): every candidate is scored — the value is
    * the per-candidate cost (m lookups) and the compressed scan, not
    * candidate pruning; compose with IVF ([[topKIvfPq]]) to prune too.
    * Rank ascending by approximate squared distance, id tie-break. */
  def topKPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 5,
      maxTrainRows: Int = 65536,
      codebooks: Option[Seq[Seq[Seq[Double]]]] = None): DataFrame = {
    val books = codebooks.getOrElse(trainPqCodebooks(corpus, m, ksub, iters, maxTrainRows))
    val dsub = books.head.head.length
    val c = pqEncode(corpus, books).withColumnRenamed("vec_id", "n_id")
    val vq = Vectors.toDouble(col("embedding"))
    val table = array(books.indices.map(j => distances(subVec(vq, j, dsub), books(j))): _*)
    val q = queries.select(col("vec_id").as("q_id"), table.as("__tab"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("adc", adcScore(col("codes"), col("__tab"), books.length))
    rankTopKAsc(scored, k, round(col("adc"), 6).as("adc"))
  }

  /** IVF-PQ (the faiss IVFADC composition — THE disk-scale ANN layout):
    * the coarse quantizer prunes candidates to nProbe inverted lists,
    * PQ codes make each surviving candidate m lookups. Same coarse
    * quantizer as [[topKIvf]], same codebooks as [[topKPq]]. */
  def topKIvfPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 5,
      maxTrainRows: Int = 65536): DataFrame = {
    val cents = trainIvfCentroids(corpus, nCentroids, iters, maxTrainRows)
    val books = trainPqCodebooks(corpus, m, ksub, iters, maxTrainRows)
    val dsub = books.head.head.length
    val v = Vectors.toDouble(col("embedding"))
    val c = pqEncode(corpus, books).withColumnRenamed("vec_id", "n_id")
      .join(scatter(corpus).select(col("vec_id").as("n_id"),
        nearestCluster(v, cents).as("__cl")), "n_id")
    val probeIds = {
      val d = distances(col("__vq"), cents)
      val idx = transform(typedLit(cents.indices.toList),
        i => struct(element_at(d, i + 1).as("d"), i.as("i")))
      slice(transform(array_sort(idx), s => s.getField("i")), 1, nProbe)
    }
    val table = array(books.indices.map(j => distances(subVec(col("__vq"), j, dsub), books(j))): _*)
    val q = queries.select(col("vec_id").as("q_id"), v.as("__vq"))
      .withColumn("__tab", table)
      .withColumn("__cl", explode(probeIds))
      .drop("__vq")
    val scored = c.join(broadcast(q), Seq("__cl"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", adcScore(col("codes"), col("__tab"), books.length))
    rankTopKAsc(scored, k, round(col("adc"), 6).as("adc"))
  }

  /** Persist a FULL IVF-PQ index (L43d — the L7c story for the
    * compressed layout): coarse centroids (`<name>_centroids`),
    * sub-codebooks (`<name>_books`, (j, cl, pos, x) rows — m·ksub·dsub
    * model-sized data) and every vector's (coarse list, PQ codes) in a
    * vec_id-PK bucketed table with the m codes as TINYINT columns.
    * The payoff over L7c: [[topKIvfPqIndexed]] answers queries from the
    * INDEX ALONE — the float corpus is never scanned again, which at
    * 100 TB is the difference between reading m bytes and 4·dim bytes
    * per candidate. Incremental growth via [[growIndexPq]]. */
  def saveIndexPq(
      spark: org.apache.spark.sql.SparkSession,
      store: graft.store.TableStore,
      name: String,
      corpus: DataFrame,
      nCentroids: Int = 16,
      m: Int = 4,
      ksub: Int = 8,
      iters: Int = 5,
      maxTrainRows: Int = 65536,
      assignBuckets: Int = 8): Unit = {
    import spark.implicits._
    val cents = trainIvfCentroids(corpus, nCentroids, iters, maxTrainRows)
    val books = trainPqCodebooks(corpus, m, ksub, iters, maxTrainRows)
    saveCentroids(spark, store, s"${name}_centroids", cents)
    val bookRows = books.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.flatMap { case (c, cl) =>
        c.zipWithIndex.map { case (x, pos) => (j, cl, pos, x) } } }
    if (!store.exists(s"${name}_books")) {
      store.createTable(s"${name}_books",
        Seq("j" -> "int", "cl" -> "int", "pos" -> "int", "x" -> "float"),
        Seq("j", "cl", "pos"))
      store.insert(s"${name}_books", bookRows.toDF("j", "cl", "pos", "x"))
    } else store.merge(s"${name}_books", bookRows.toDF("j", "cl", "pos", "x"))
    if (!store.exists(s"${name}_assign")) {
      store.createTable(s"${name}_assign",
        ("vec_id" -> "bigint") +: ("cl" -> "int") +:
          (0 until m).map(j => s"c$j" -> "tinyint"),
        Seq("vec_id"), buckets = assignBuckets)
      store.insert(s"${name}_assign", pqAssignments(corpus, cents, books))
    } else store.merge(s"${name}_assign", pqAssignments(corpus, cents, books))
  }

  /** (vec_id, coarse cl, c0..c{m-1}) rows for an IVF-PQ index. */
  private[graft] def pqAssignments(corpus: DataFrame, cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val dsub = books.head.head.length
    val v = Vectors.toDouble(col("embedding"))
    scatter(corpus).select(
      (col("vec_id") +: nearestCluster(v, cents).as("cl") +:
        books.indices.map(j =>
          nearestCluster(subVec(v, j, dsub), books(j)).as(s"c$j"))): _*)
  }

  /** Load a persisted sub-codebook table back to m × ksub × dsub. */
  def loadPqBooks(store: graft.store.TableStore, table: String): Seq[Seq[Seq[Double]]] =
    store.readTable(table, orderBy = Seq("j", "cl", "pos")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, js) => js.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, cs) => cs.sortBy(_._3).map(_._4).toIndexedSeq } }

  /** Assign ONLY `newVectors` under the persisted quantizers and upsert
    * — the faiss add() contract for the compressed index: stored lists
    * and codes stay valid, cost is O(new vectors). */
  def growIndexPq(store: graft.store.TableStore, name: String,
      newVectors: DataFrame): Unit = {
    val cents = loadCentroids(store, s"${name}_centroids")
    val books = loadPqBooks(store, s"${name}_books")
    store.upsert(s"${name}_assign", pqAssignments(newVectors, cents, books))
  }

  /** IVF-PQ top-k answered from the PERSISTED index alone — no float
    * corpus scan: candidates come from the bucketed assign table, and
    * each candidate's ADC score is m table lookups over its stored
    * codes. Equal to [[topKIvfPq]] under the same trained model
    * (spec-pinned). */
  def topKIvfPqIndexed(
      store: graft.store.TableStore,
      name: String,
      queries: DataFrame,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val cents = loadCentroids(store, s"${name}_centroids")
    val books = loadPqBooks(store, s"${name}_books")
    val dsub = books.head.head.length
    val m = books.length
    val c = store.readTable(s"${name}_assign")
      .select((col("vec_id").as("n_id") +: col("cl").as("__cl") +:
        (0 until m).map(j => col(s"c$j").cast("int").as(s"c$j"))): _*)
    val probeIds = {
      val d = distances(col("__vq"), cents)
      val idx = transform(typedLit(cents.indices.toList),
        i => struct(element_at(d, i + 1).as("d"), i.as("i")))
      slice(transform(array_sort(idx), s => s.getField("i")), 1, nProbe)
    }
    val table = array(books.indices.map(j => distances(subVec(col("__vq"), j, dsub), books(j))): _*)
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__tab", table)
      .withColumn("__cl", explode(probeIds))
      .drop("__vq")
    val adc = (0 until m).map(j =>
      element_at(element_at(col("__tab"), j + 1), col(s"c$j") + 1))
      .reduce(_ + _)
    val scored = c.join(broadcast(q), Seq("__cl"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", adc)
    rankTopKAsc(scored, k, round(col("adc"), 6).as("adc"))
  }

  /** (vec_id, coarse cl, c0..c{m-1}) under FIXED integer seeds — the
    * portable-index form of [[pqAssignments]]. */
  private def pqAssignUnderSeeds(
      corpus: DataFrame,
      coarse: Array[Array[Long]],
      subSeeds: IndexedSeq[Array[Array[Long]]]): DataFrame = {
    val m = subSeeds.length
    val dsub = subSeeds.head.head.length
    def argmin(d: Column): Column = (array_position(d, array_min(d)) - 1).cast("int")
    scatter(corpus)
      .select(col("vec_id"), intVec(Vectors.toDouble(col("embedding"))).as("__vi"))
      .select((col("vec_id") +:
        argmin(intDists(col("__vi"), coarse)).as("cl") +:
        (0 until m).map(j =>
          argmin(intDists(subVec(col("__vi"), j, dsub), subSeeds(j))).as(s"c$j"))): _*)
  }

  /** Persist a PORTABLE IVF-PQ index (the L43d layout with L43b
    * arithmetic — VERDICT r7 #4): coarse integer seeds
    * (`<name>_centroids`), integer sub-codebooks (`<name>_books`,
    * (j, cl, pos, xi) BIGINT — the ksub hash-sampled seed vectors
    * sliced into m subspaces) and every vector's (coarse list,
    * m TINYINT codes). Every stored table re-derives verbatim in ANSI
    * SQL, so the from-index-alone search is hash-verifiable end to end.
    * [[saveIndexPq]] (Lloyd model) stays the quality path. */
  def saveIndexPqPortable(
      spark: org.apache.spark.sql.SparkSession,
      store: graft.store.TableStore,
      name: String,
      corpus: DataFrame,
      nCentroids: Int = 16,
      m: Int = 4,
      ksub: Int = 8,
      assignBuckets: Int = 8): Unit = {
    import spark.implicits._
    val coarse = portableSeeds(corpus, nCentroids)
    val seeds = portableSeeds(corpus, ksub)
    require(seeds.nonEmpty,
      "saveIndexPqPortable: empty corpus — no vectors to seed the codebooks from")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val dsub = dim / m
    val subSeeds = (0 until m).map(j => seeds.map(_.slice(j * dsub, (j + 1) * dsub)))
    val centRows = coarse.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (x, p) => (c, p, x) } }.toSeq
    if (!store.exists(s"${name}_centroids")) {
      store.createTable(s"${name}_centroids",
        Seq("cl" -> "int", "pos" -> "int", "xi" -> "bigint"), Seq("cl", "pos"))
      store.insert(s"${name}_centroids", centRows.toDF("cl", "pos", "xi"))
    } else store.merge(s"${name}_centroids", centRows.toDF("cl", "pos", "xi"))
    val bookRows = subSeeds.zipWithIndex.flatMap { case (cb, j) =>
      cb.toIndexedSeq.zipWithIndex.flatMap { case (c, cl) =>
        c.toIndexedSeq.zipWithIndex.map { case (x, pos) => (j, cl, pos, x) } } }.toSeq
    if (!store.exists(s"${name}_books")) {
      store.createTable(s"${name}_books",
        Seq("j" -> "int", "cl" -> "int", "pos" -> "int", "xi" -> "bigint"),
        Seq("j", "cl", "pos"))
      store.insert(s"${name}_books", bookRows.toDF("j", "cl", "pos", "xi"))
    } else store.merge(s"${name}_books", bookRows.toDF("j", "cl", "pos", "xi"))
    if (!store.exists(s"${name}_assign")) {
      store.createTable(s"${name}_assign",
        ("vec_id" -> "bigint") +: ("cl" -> "int") +:
          (0 until m).map(j => s"c$j" -> "tinyint"),
        Seq("vec_id"), buckets = assignBuckets)
      store.insert(s"${name}_assign", pqAssignUnderSeeds(corpus, coarse, subSeeds))
    } else store.merge(s"${name}_assign", pqAssignUnderSeeds(corpus, coarse, subSeeds))
  }

  /** Load persisted integer sub-codebooks back to m × ksub × dsub. */
  def loadPortableBooks(store: graft.store.TableStore, table: String): IndexedSeq[Array[Array[Long]]] =
    store.readTable(table, orderBy = Seq("j", "cl", "pos")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, js) => js.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, cs) => cs.sortBy(_._3).map(_._4).toArray }.toArray }.toIndexedSeq

  /** faiss add() for the portable compressed index: assign ONLY
    * `newVectors` under the PERSISTED quantizers and upsert. */
  def growIndexPqPortable(store: graft.store.TableStore, name: String,
      newVectors: DataFrame): Unit =
    store.upsert(s"${name}_assign",
      pqAssignUnderSeeds(newVectors,
        loadPortableSeeds(store, s"${name}_centroids"),
        loadPortableBooks(store, s"${name}_books")))

  /** IVF-PQ top-k answered from the PERSISTED portable index alone —
    * no float-corpus scan, every ADC term an exact long, the whole
    * pipeline (stored tables included) DuckDB-oracle-exact. */
  def topKIvfPqIndexedPortable(
      store: graft.store.TableStore,
      name: String,
      queries: DataFrame,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val coarse = loadPortableSeeds(store, s"${name}_centroids")
    val books = loadPortableBooks(store, s"${name}_books")
    val m = books.length
    val dsub = books.head.head.length
    val c = store.readTable(s"${name}_assign")
      .select((col("vec_id").as("n_id") +: col("cl").as("__cl") +:
        (0 until m).map(j => col(s"c$j").cast("int").as(s"c$j"))): _*)
    val probeIds = {
      val d = intDists(intVec(col("__vq")), coarse)
      val idx = transform(typedLit(coarse.indices.toList),
        i => struct(element_at(d, i + 1).as("d"), i.as("i")))
      slice(transform(array_sort(idx), s => s.getField("i")), 1, nProbe)
    }
    val table = array((0 until m).map(j =>
      intDists(subVec(intVec(col("__vq")), j, dsub), books(j))): _*)
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__tab", table)
      .withColumn("__cl", explode(probeIds))
      .drop("__vq")
    val adc = (0 until m).map(j =>
      element_at(element_at(col("__tab"), j + 1), col(s"c$j") + 1))
      .reduce(_ + _)
    val scored = c.join(broadcast(q), Seq("__cl"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", adc)
    rankTopKAsc(scored, k, col("adc"))
  }

  /** Engine-PORTABLE PQ twin (the A14b/L3b/L7d idiom, applied to PQ):
    * codebook j = the subvectors of the ksub smallest-(md5(vec_id), id)
    * corpus rows (hash-sampled codebooks — valid PQ, just less even;
    * recall/cost, not correctness), every distance an exact INTEGER over
    * floor(v_i · 2^20) coordinates, the ADC score an exact long sum —
    * so the WHOLE pipeline (codebooks → codes → table → score → rank)
    * is reproducible bit-for-bit in ANSI SQL and the driver query is
    * hash-verified. [[topKPq]] (Lloyd books, double ADC) stays the
    * quality/scale path. */
  def topKPqPortable(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      m: Int = 4,
      ksub: Int = 8): DataFrame = {
    val seeds = portableSeeds(corpus, ksub)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val dsub = dim / m
    val subSeeds: IndexedSeq[Array[Array[Long]]] =
      (0 until m).map(j => seeds.map(_.slice(j * dsub, (j + 1) * dsub)))
    def subDists(v: Column, j: Int): Column =
      intDists(subVec(intVec(v), j, dsub), subSeeds(j))
    val vc = Vectors.toDouble(col("embedding"))
    // corpus: per-subspace argmin code (first-min = smaller cl on ties)
    val codes = array((0 until m).map { j =>
      val d = subDists(vc, j)
      (array_position(d, array_min(d)) - 1).cast("int")
    }: _*)
    val c = scatter(corpus).select(col("vec_id").as("n_id"), codes.as("codes"))
    // query: exact integer ADC table, m × ksub longs
    val table = array((0 until m).map(j => subDists(col("__vq"), j)): _*)
    val q = queries.select(col("vec_id").as("q_id"), Vectors.toDouble(col("embedding")).as("__vq"))
      .withColumn("__tab", table).drop("__vq")
    val score = aggregate(
      transform(sequence(lit(0), lit(m - 1)),
        j => element_at(element_at(col("__tab"), j + 1), element_at(col("codes"), j + 1) + 1)),
      lit(0L), (a, x) => a + x)
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("adc", score)
    rankTopKAsc(scored, k, col("adc"))
  }

  /** Ascending-rank tail for distance-scored variants: (q_id, n_id,
    * rank, adc) by (adc asc, n_id) per query, top k. */
  private def rankTopKAsc(scored: DataFrame, k: Int, adcOut: Column): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), adcOut)
  }

  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val v = Vectors.toDouble(col("embedding"))
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    def code(x: Column): Column =
      when(col("__s") > 0,
        least(greatest(round(x / col("__s"), 0), lit(-127.0)), lit(127.0)))
        .otherwise(lit(0.0))
    embeddings.select(col("vec_id"), v.as("__v"), scale.as("__s"))
      .select(col("vec_id"),
        round(col("__s"), 6).as("scale"),
        aggregate(transform(col("__v"), x => code(x)), lit(0L),
          (a, q) => a + q.cast("long")).as("q_sum"),
        round(array_max(transform(col("__v"),
          x => abs(x - code(x) * col("__s")))), 6).as("max_abs_err"))
      .orderBy("vec_id")
  }
}
