package graft.state

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, BloomFilterAggregate, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Partitioned, append-only URL-seen state — the scale-true replacement for
  * a driver-built global Bloom filter (which at the north_star's 10^10 seen
  * URLs is a ~12 GB bitset: driver OOM + an impossible broadcast).
  *
  * Layout under `dir`:
  * {{{
  *   store.json                       parts / fpp / sketch config (fixed at creation)
  *   inc-<id>/data/seen_part=<p>/…    parquet url_hash increments (append-only)
  *   inc-<id>/sketch/p-<p>.<type>     per-partition sketch blob (bloom | cuckoo)
  *   manifest/inc-<id>.json           commit marker (atomic rename)
  * }}}
  *
  * Scale properties:
  *  - sketches are built by executors (`bloom_filter_agg` / the cuckoo
  *    `TypedImperativeAggregate` grouped on `seen_part`) and written by
  *    executors — the driver never materializes any sketch;
  *  - the probe runs inside whole-stage codegen: candidates are exchanged
  *    once on `seen_part`, each task lazily loads only its partitions'
  *    sketches (|seen|/parts bytes each) from shared storage;
  *  - commits are O(|increment|): no rewrite of the accumulated seen set
  *    (the reference's analog is its append-only `sync.Map` registration,
  *    /root/reference/dialer.go:401-410);
  *  - sketch false positives fall through to an exact left-anti join against
  *    the increment parquet, so the filter is exact.
  */
object SeenStore {

  final case class Config(parts: Int = 64, fpp: Double = 0.01, sketch: String = "bloom")

  final case class Filtered(result: DataFrame, release: () => Unit)

  def apply(dir: String, cfg: Config = Config()): Store = new Store(dir, cfg)

  final class Store(val dir: String, defaultCfg: Config) {

    /** Store config is fixed by whoever appends first (probe and append
      * must agree on the partitioning forever). */
    def config: Config = {
      val p = Paths.get(dir, "store.json")
      if (Files.exists(p)) {
        val n = mapper.readTree(Files.readAllBytes(p))
        Config(n.get("parts").asInt(), n.get("fpp").asDouble(), n.get("sketch").asText())
      } else defaultCfg
    }

    private def writeConfig(cfg: Config): Unit = {
      val p = Paths.get(dir, "store.json")
      if (!Files.exists(p)) {
        Files.createDirectories(p.getParent)
        Files.write(p, s"""{"parts":${cfg.parts},"fpp":${cfg.fpp},"sketch":"${cfg.sketch}"}"""
          .getBytes("UTF-8"))
      }
    }

    /** Committed increment ids: the contiguous prefix 0..k (an orphan
      * increment beyond a crash is invisible until recommitted). */
    def committedIds: Seq[Long] = {
      val mdir = Paths.get(dir, "manifest")
      if (!Files.exists(mdir)) return Seq.empty
      import scala.jdk.CollectionConverters._
      val ids = Files.list(mdir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("inc-") && n.endsWith(".json"))
        .map(n => n.stripPrefix("inc-").stripSuffix(".json").toLong)
        .toSeq.sorted
      ids.zipWithIndex.takeWhile { case (id, i) => id == i }.map(_._1)
    }

    def isEmpty: Boolean = committedIds.isEmpty

    /** Append one increment (id must be committedIds.length — contiguous).
      * Idempotent: a crashed/orphaned increment with the same id is
      * overwritten. O(|newSeen|) I/O; the existing seen set is untouched. */
    def append(newSeen: DataFrame, id: Long, counters: Map[String, Long] = Map.empty): Unit = {
      val cfg = config
      writeConfig(cfg)
      require(id == committedIds.length, s"non-contiguous increment $id (have ${committedIds.length})")
      val incDir = s"$dir/inc-$id"
      val inc = newSeen.select(col("url_hash").cast("long").as("url_hash"))
        .distinct() // within-increment only: O(|new|)
        .withColumn("seen_part", pmod(col("url_hash"), lit(cfg.parts)).cast("int"))
        .repartition(cfg.parts, col("seen_part"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val obs = Observation(s"seen-inc-$id")
      inc.observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").partitionBy("seen_part").parquet(s"$incDir/data")
      val rows = obs.get("rows").asInstanceOf[Long]

      // per-partition sketches, built and written entirely executor-side
      val perPart = math.max(64L, 2L * rows / cfg.parts)
      val sketchCol = cfg.sketch match {
        case "cuckoo" => cuckooAgg(col("url_hash"), perPart)
        case _ => bloomAgg(col("url_hash"), perPart, cfg.fpp)
      }
      val ext = cfg.sketch
      val sketchDir = s"$incDir/sketch"
      inc.groupBy(col("seen_part")).agg(sketchCol.as("sk"))
        .select(col("seen_part"), col("sk"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val conf = new org.apache.hadoop.conf.Configuration()
          it.foreach { row =>
            val p = new org.apache.hadoop.fs.Path(s"$sketchDir/p-${row.getInt(0)}.$ext")
            val fs = p.getFileSystem(conf)
            val out = fs.create(p, true)
            out.write(row.getAs[Array[Byte]](1))
            out.close()
          }
        }
      inc.unpersist()

      // commit marker last (atomic rename = the commit point)
      val mdir = Paths.get(dir, "manifest")
      Files.createDirectories(mdir)
      val json = mapper.createObjectNode()
      json.put("id", id)
      json.put("rowCount", rows)
      val cn = json.putObject("counters")
      counters.toSeq.sortBy(_._1).foreach { case (k, v) => cn.put(k, v) }
      val tmp = mdir.resolve(s".tmp-inc-$id.json")
      Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json))
      Files.move(tmp, mdir.resolve(s"inc-$id.json"), StandardCopyOption.ATOMIC_MOVE)
    }

    /** All committed seen hashes (exact), up to `maxId` inclusive. */
    def seenHashes(spark: SparkSession, maxId: Option[Long] = None): Option[DataFrame] = {
      val ids = maxId.map(m => committedIds.filter(_ <= m)).getOrElse(committedIds)
      if (ids.isEmpty) None
      else Some(ids.map(i => spark.read.parquet(s"$dir/inc-$i/data").select(col("url_hash")))
        .reduce(_ unionByName _))
    }

    /** Exact unseen filter: sketch fast-path (no join for definite
      * negatives) + exact anti-join fallback for sketch maybes. The
      * candidate subtree is persisted before the split so it computes ONCE.
      * Call `release()` once downstream results are materialized. */
    def filterUnseen(candidates: DataFrame, maxId: Option[Long] = None): Filtered = {
      val ids = maxId.map(m => committedIds.filter(_ <= m)).getOrElse(committedIds)
      if (ids.isEmpty) return Filtered(candidates, () => ())
      val cfg = config
      val nInc = ids.length
      val flagged = candidates
        .withColumn("__seen_part", pmod(col("url_hash"), lit(cfg.parts)).cast("int"))
        .repartition(cfg.parts, col("__seen_part"))
        .withColumn("__maybe", seenMightContain(col("__seen_part"), col("url_hash"), dir, nInc))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val definiteNew = flagged.filter(!col("__maybe"))
      val seen = seenHashes(candidates.sparkSession, Some(ids.last)).get
      val checked = flagged.filter(col("__maybe"))
        .join(seen, Seq("url_hash"), "left_anti")
      Filtered(
        definiteNew.unionByName(checked).drop("__seen_part", "__maybe"),
        () => { flagged.unpersist(); () })
    }
  }

  private def mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  // --- sketch aggregate columns (Bridge: Column companion is private[sql]) --

  import org.apache.spark.sql.graft.Bridge

  /** Spark's own BloomFilterAggregate (a TypedImperativeAggregate) grouped
    * per seen_part — the executor-side Bloom build. */
  def bloomAgg(child: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    Bridge.column(new BloomFilterAggregate(Bridge.expression(child),
      Literal(expectedItems), Literal(bits), 0, 0)
      .toAggregateExpression())
  }

  /** The cuckoo-filter TypedImperativeAggregate (north_star state sketch). */
  def cuckooAgg(child: Column, capacity: Long): Column =
    Bridge.column(AggregateExpression(
      CuckooFilterAggregate(Bridge.expression(child), capacity), Complete, isDistinct = false))

  def seenMightContain(part: Column, hash: Column, dir: String, nInc: Int): Column =
    Bridge.column(SeenMightContain(Bridge.expression(part), Bridge.expression(hash), dir, nInc))
}

/** Builds a [[CuckooFilter]] over a LONG column — same shape as Spark's
  * BloomFilterAggregate; emits the serialized filter. */
case class CuckooFilterAggregate(
    child: Expression,
    capacity: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): CuckooFilter = CuckooFilter.create(capacity)
  override def update(buf: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }
  override def merge(a: CuckooFilter, b: CuckooFilter): CuckooFilter = a.merge(b)
  override def eval(buf: CuckooFilter): Any = buf.serialize()
  override def serialize(buf: CuckooFilter): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CuckooFilter = CuckooFilter.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cuckoo_filter_agg"
  override def withNewMutableAggBufferOffset(offset: Int): CuckooFilterAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CuckooFilterAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CuckooFilterAggregate =
    copy(child = c)
}

/** Codegen probe against the store's per-partition sketches: loads (and
  * JVM-caches) only the sketch files the task's rows actually hit. */
case class SeenMightContain(left: Expression, right: Expression, dir: String, nInc: Int)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullSafeEval(part: Any, hash: Any): Any =
    SketchBank.mightContain(dir, nInc, part.asInstanceOf[Int], hash.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dirRef = ctx.addReferenceObj("seenDir", dir, "java.lang.String")
    defineCodeGen(ctx, ev, (p, h) => s"graft.state.SketchBank.mightContain($dirRef, $nInc, $p, $h)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SeenMightContain =
    copy(left = l, right = r)
  override def prettyName: String = "seen_might_contain"
}

/** Per-JVM lazy sketch loader. An executor ends up caching only the
  * partitions routed to it (candidates are exchanged on seen_part), so
  * executor memory is O(|seen| / parts × parts-per-executor), and driver
  * memory is O(1) — independent of |seen|. */
object SketchBank {
  private trait Probe { def mightContain(h: Long): Boolean }
  private object Absent extends Probe { def mightContain(h: Long) = false }
  private final class Bloom(b: org.apache.spark.util.sketch.BloomFilter) extends Probe {
    def mightContain(h: Long): Boolean = b.mightContainLong(h)
  }
  private final class Cuckoo(c: CuckooFilter) extends Probe {
    def mightContain(h: Long): Boolean = c.mightContain(h)
  }

  private val MaxEntries = 4096
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Probe](256, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Probe]): Boolean =
        size > MaxEntries
    })

  def mightContain(dir: String, nInc: Int, part: Int, hash: Long): Boolean = {
    var i = 0
    while (i < nInc) {
      if (get(dir, i, part).mightContain(hash)) return true
      i += 1
    }
    false
  }

  private def get(dir: String, inc: Int, part: Int): Probe = {
    val key = s"$dir/inc-$inc/sketch/p-$part"
    val hit = cache.get(key)
    if (hit != null) return hit
    val loaded = load(key)
    cache.put(key, loaded)
    loaded
  }

  private def load(prefix: String): Probe = {
    val conf = new org.apache.hadoop.conf.Configuration()
    def bytesOf(p: org.apache.hadoop.fs.Path): Option[Array[Byte]] = {
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val len = fs.getFileStatus(p).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(0, buf)
          Some(buf)
        } finally in.close()
      }
    }
    bytesOf(new org.apache.hadoop.fs.Path(prefix + ".bloom"))
      .map(b => new Bloom(org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(b))): Probe)
      .orElse(bytesOf(new org.apache.hadoop.fs.Path(prefix + ".cuckoo"))
        .map(b => new Cuckoo(CuckooFilter.deserialize(b)): Probe))
      .getOrElse(Absent)
  }

  /** test hook */
  private[graft] def clear(): Unit = cache.clear()
}
