package graft.plans

import org.apache.spark.sql.DataFrame

/** Session-scoped, FILE-backed cache for a SHARED PROJECTION — a small
  * derived table (thresholded edge list, verified near-dup pairs) whose
  * SUBTREE is corpus-sized and which several registry queries rebuild
  * independently. Generalized in r15 from the graph family's
  * [[graft.operators.GraphProjectionCache]] (r13/r14, where the device
  * collapsed the sf10 family 162-217 s → 4.7-14.3 s) so the dedup
  * family's verified-pairs tables ride the same mechanism: a session
  * pays each projection's build ONCE per (corpus, params) instead of
  * once per query. At 100 TB this is the lakehouse shape — the pairs /
  * edge table is a materialized artifact the downstream passes scan,
  * not a plan they re-run.
  *
  * Why a FILE and not a persist/`lazyPin`: the harnesses release every
  * checkpoint/persist reachable from a result plan after each query
  * (`ColumnBridge.releaseAllCheckpoints` — the Bench/Verify ownership
  * contract), so a block-backed cache would be evicted between the
  * queries it exists to serve. A parquet sink has no block lifecycle:
  * each query's plan just SCANS it. Most projections are tiny
  * (thresholded pair/edge lists, O(10³-10⁵) rows at any measured SF);
  * two members are CORPUS-sized but byte-thin — the PQ codes table
  * (16 bytes/vector: id + packed code, ~3% of the embedding table's
  * width) and the bipartite edge list (two 8-byte keys/edge) — so even
  * their reads are a small fraction of the scan the projection saves,
  * and the parquet is splittable on a real cluster's shared FS.
  *
  * ORDERING: the cache carries NO row-order guarantee — parquet read
  * order follows split packing (descending file size), not write
  * order, once a projection spans multiple part files. Callers whose
  * REGISTRY output is the projection itself (emb_pq_encode,
  * dedup_near_minhash, dedup_ngram_jaccard) must therefore write the
  * projection UNSORTED and re-apply their terminal `orderBy` AFTER the
  * cache read (r16, ADVICE r15: the pre-write sort silently held only
  * while small-SF writes coalesced to one file — and skipping it also
  * removes a corpus-wide sort from the PQ cold build). Non-terminal
  * consumers (cluster closure, dup_hist, ADC scoring) are
  * order-insensitive and scan the files as-is.
  *
  * Key = session identity + a typed-operator-safe semantic plan hash +
  * the input-file modification snapshot (an in-place corpus rewrite
  * changes the snapshot and misses — the [[graft.operators.VectorOps
  * .cachedIvfIndex]] staleness guard). `semanticHash` alone is NOT
  * stable across two constructions of a plan containing a typed
  * map/flatMap — the encoder's `mapobjects` deserializer embeds a
  * `LambdaVariable` whose per-JVM id escapes canonicalization — so the
  * key scrubs lambdavariable tokens from the canonicalized treeString
  * and folds in the leaves' own canonical hashCodes (treeString elides
  * LocalRelation DATA; without the leaves two different in-memory toy
  * inputs would collide — both defects caught by spec in r15).
  *
  * The write is eager at CONSTRUCTION (the sink_partitioned precedent);
  * concurrent constructors of one key serialize on `computeIfAbsent`,
  * so exactly one writes. Entries live until JVM exit — [[graft
  * .operators.SinkJanitor]]'s shutdown hook removes the dirs; per-
  * session entry count is bounded by the distinct (projection, corpus,
  * params) triples a session touches. Each build stamps its duration
  * to stderr so bench artifacts can split build vs consumer cost (the
  * r14 adjudication gap); hits are silent and free. */
private[graft] object ProjectionCache {
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def entryCount: Int = dirs.size()

  /** Cache directories owned by `spark` under `tag` — the ordering
    * spec's hook: it counts part files to prove the multi-file case is
    * actually exercised. */
  private[graft] def dirsFor(
      spark: org.apache.spark.sql.SparkSession, tag: String): Seq[String] = {
    val prefix = s"${System.identityHashCode(spark)}:$tag"
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    dirs.forEach((k, v) => if (k.startsWith(prefix)) out += v)
    out.toSeq
  }

  /** Entries owned by `spark` (keys are session-identity-prefixed) —
    * the specs' counter: suites run in parallel and, with caches on by
    * default, OTHER suites' constructions move the global count; a
    * per-session count is race-free because each spec asserts against
    * its own cloned session. Pass `tag` to scope to one projection
    * family. */
  private[graft] def entryCountFor(
      spark: org.apache.spark.sql.SparkSession,
      tag: String = ""): Int = {
    val prefix = s"${System.identityHashCode(spark)}:$tag"
    var n = 0
    dirs.keySet().forEach(k => if (k.startsWith(prefix)) n += 1)
    n
  }

  /** Strong content key: MD5 over the scrubbed canonical treeString
    * plus every leaf's own canonical treeString (r16, ADVICE r15: the
    * previous 32-bit String.hashCode pair made a silent wrong-rows
    * collision possible within a session; a 128-bit digest over the
    * full canonical text has no practical collision path). treeString
    * elides LocalRelation DATA, so the leaves are folded in at full
    * depth — without them two different in-memory toy inputs collide
    * (the r15 spec-caught defect). */
  private def planKey(pairs: DataFrame): String = {
    val canon = pairs.queryExecution.analyzed.canonicalized
    val scrubbed = canon.treeString
      .replaceAll("lambdavariable\\([^)]*\\)", "lambdavariable(#)")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(scrubbed.getBytes("UTF-8"))
    canon.collectLeaves().foreach { l =>
      md.update(l.canonicalized.treeString.getBytes("UTF-8"))
      // LocalRelation treeString elides rows; its canonical hashCode
      // covers the data the text elides
      md.update(java.nio.ByteBuffer.allocate(4).putInt(l.hashCode()).array())
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Route `pairs` through the session's file cache under `tag`,
    * gated on `confKey` (default ON; set the conf `false` to opt out —
    * the plan-shape specs do). Results are row-identical either way.
    *
    * `partitionBy` (r18, VERDICT r17 #2): layout-partition the sunk
    * artifact by the named columns — the deployment shape for
    * projections whose consumers route to a key subset (the IVF+PQ
    * codes table partitions by `cell`, so a probe's tier-1 ADC scan is
    * a DIRECTORY selection of nprobe/nlist of the artifact, proven by
    * `PartitionFilters` in the scan guard, never a corpus scan with a
    * row filter). The read re-applies the logical schema, so column
    * order and types are identical to the unpartitioned form; the key
    * folds the layout in so the same projection cached under two
    * layouts cannot collide. */
  def apply(tag: String, confKey: String, pairs: DataFrame,
            partitionBy: Seq[String] = Nil): DataFrame = {
    val spark = pairs.sparkSession
    if (!spark.conf.get(confKey, "true").toBoolean) return pairs
    val contentKey = s"$tag:${planKey(pairs)}:" +
      s"${graft.operators.VectorOps.inputSnapshot(pairs)}" +
      (if (partitionBy.isEmpty) "" else s":part=${partitionBy.mkString(",")}")
    val key = s"${System.identityHashCode(spark)}:$contentKey"
    val dir = dirs.computeIfAbsent(key, _ =>
      durableDir(spark, tag, contentKey, pairs, partitionBy).getOrElse {
        val d = s"${System.getProperty("java.io.tmpdir")}/graft-proj-$tag-" +
          s"${graft.operators.Scans.sessionTag(spark)}/p${seq.incrementAndGet()}"
        build(pairs, partitionBy, d, tag, key)
        graft.operators.SinkJanitor.register(spark, s"proj/$key", d, Nil, spark)
        d
      })
    // explicit schema: a zero-row projection writes no row groups, and
    // schema inference would fail on the empty dir; for a partitioned
    // layout it also pins the partition columns' positions and types
    // back to the logical schema (directory discovery would move them
    // to the end)
    spark.read.schema(pairs.schema).parquet(dir)
  }

  /** One projection write + build stamp (shared by the durable and the
    * per-session paths). Partitioned layout: shuffle rows to their
    * partition first, so each directory holds ONE file instead of
    * (writers × keys) small files — the inverted-list shape a
    * directory-pruned read wants. */
  private def build(pairs: DataFrame, partitionBy: Seq[String],
                    d: String, tag: String, key: String): Unit = {
    val t0 = System.nanoTime()
    val toWrite =
      if (partitionBy.isEmpty) pairs
      else pairs.repartition(partitionBy.map(pairs.col): _*)
    toWrite.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(d)
    Console.err.println(
      f"[graft] $tag projection BUILD ${(System.nanoTime() - t0) / 1e9}%.1fs key=$key")
  }

  /** CROSS-SESSION durable artifact path (r19, VERDICT r18 Next #3):
    * when `spark.graft.projection.store` names a directory (default:
    * DISABLED — a deployment opts in by pointing the conf at shared
    * storage), the projection is persisted there under a CONTENT
    * address — md5
    * of (tag, canonical plan, input-file snapshot, layout) — and a
    * COLD JVM whose corpus and params match directory-reads the sunk
    * artifact instead of re-running the corpus-sized build (the
    * lakehouse shape: the graph family's shared co-purchase projection
    * cost 187 s cold at sf10 — per-query cold sessions paid it per
    * process). Staleness is the key's job: an in-place corpus rewrite
    * changes the file snapshot and misses. Writers race safely: build
    * lands in a `.tmp-<uuid>` sibling and publishes by atomic rename;
    * a lost race deletes its tmp and reads the winner. Durable dirs
    * are NOT janitor-registered — surviving JVM exit is the point.
    * Returns None when the store is disabled or unusable (caller falls
    * back to the per-session tmp build).
    *
    * Default OFF (r19 optimization round): a measured bench/oracle run
    * must compute every projection from the parquet inputs — a store
    * hit keyed on the test corpus would time a directory read instead
    * of the computation (cross-run result caching, not optimization).
    * Production clusters opt in explicitly; nothing in Bench/Verify
    * sets the conf. */
  private def durableDir(spark: org.apache.spark.sql.SparkSession,
                         tag: String, contentKey: String, pairs: DataFrame,
                         partitionBy: Seq[String]): Option[String] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = spark.conf.get("spark.graft.projection.store", "")
    if (root.isEmpty) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    val addr = md.digest(contentKey.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // dir name keeps the graft-proj-<tag> marker the cache-scan specs
    // (and humans reading inputFiles) key on
    val target = Paths.get(root, s"graft-proj-$tag-$addr")
    try {
      Files.createDirectories(Paths.get(root))
      if (Files.exists(target.resolve("_SUCCESS"))) {
        Console.err.println(s"[graft] $tag projection STORE HIT $target")
        return Some(target.toString)
      }
      val tmp = Paths.get(root,
        s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      build(pairs, partitionBy, tmp.toString, tag, contentKey)
      try {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        Console.err.println(s"[graft] $tag projection STORE WRITE $target")
      } catch {
        case _: java.nio.file.FileSystemException =>
          // lost the publish race — the winner's artifact is the same
          // content by construction; drop ours and read theirs
          deleteRecursively(tmp.toFile)
          if (!Files.exists(target.resolve("_SUCCESS"))) return None
      }
      Some(target.toString)
    } catch {
      case _: java.io.IOException => None
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
