package graft.sources

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot manifests for stored layouts — READER ISOLATION for the
  * stored-index data plane (the control-plane twin of
  * [[IndexFS.withWriterLease]], which serializes writers but cannot
  * protect a probe racing a maintenance rewrite).
  *
  * The problem it solves: a dynamic-partition-overwrite (or a
  * staging-dir swap) REPLACES files in place, so a probe that planned
  * its scan before the rewrite can fault on vanished files
  * (FileNotFoundException) or read a half-replaced generation. At
  * 100 TB the stored indexes exist precisely to be probed WHILE
  * nightly maintenance runs, so in-place replacement is not an option.
  *
  * The design (the Iceberg/Delta snapshot idea, cut down to what the
  * graft layouts need):
  *
  *  - every component keeps ONE stable directory, with one extra
  *    LEADING partition level `gsn=<stamp>` (generation stamp). A
  *    maintenance op never modifies or deletes a live file: it writes
  *    its output to a hidden staging directory and RENAMES it in as a
  *    fresh stamp's subtree (pure addition — one data write, one
  *    metadata move, and the output path never overlaps the input
  *    paths, so Spark's overwrite-while-reading guard never needs a
  *    defensive materialization), then
  *  - publishes the next numbered MANIFEST under `base/_SNAPSHOTS/`
  *    by atomic exclusive create. The manifest records, per component,
  *    which (partition, gsn) combinations are LIVE — ownership, as
  *    explicit include/exclude partition-value lists per stamp;
  *  - a reader resolves the LATEST manifest once per query and applies
  *    the ownership predicate as an ordinary static partition filter
  *    over a SINGLE scan of the component directory — partition
  *    pruning and dynamic partition pruning keep working exactly as
  *    on the un-versioned layout, and the files a resolved manifest
  *    references are immutable, so the read is a consistent snapshot;
  *  - old generations are garbage-collected only after a GRACE period
  *    and only when unreferenced by the kept manifests, so an
  *    in-flight probe that resolved the previous manifest finishes
  *    against intact files.
  *
  * Crash atomicity falls out: every mutation — append, delete,
  * compact, scrub, resplit, full rebuild, table MERGE — becomes "write
  * new leaves, flip one manifest". A crash before the publish leaves
  * unreferenced leaves (reclaimed by grace-period GC) and readers
  * never see them; a crash after the publish is a completed
  * operation. This retires the bespoke crash protocols the layouts
  * used to carry (`swapInPlace` rename choreography, the LM
  * compactor's `_COMPACT_COMMIT` two-phase swap): the manifest IS the
  * commit point. Generalizes the reference's per-row commit
  * no-partial-visibility contract (Odoo-Batch-Processing.user.js:554-621)
  * to whole-layout maintenance.
  *
  * Stamps are random 63-bit values, not a counter: a writer that
  * crashed after writing data but before publishing can never collide
  * with a later writer's leaf directories, so orphaned leaves are
  * inert garbage rather than corruption. Manifest FILES are numbered
  * monotonically (readers take the max); numbering is race-free
  * because every publisher holds the layout's writer lease.
  */
object Snapshot {

  /** The trailing generation-stamp partition column added to every
    * snapshot-managed component. Not a data column: readers drop it.
    */
  val GSN = "gsn"

  private val manifestDirName = "_SNAPSHOTS"
  private def manifestDir(base: String): String = s"$base/$manifestDirName"

  /** One writer-generation's claim over a component's partitions.
    * `include = Some(tuples)` owns exactly those partition-value
    * tuples; `include = None` owns every partition present at this
    * stamp except `exclude` (the full-rebuild form — the writer need
    * not enumerate what it wrote). Values are the partition-directory
    * strings.
    */
  final case class Owner(gsn: Long, include: Option[Seq[Seq[String]]],
                         exclude: Seq[Seq[String]])

  /** A component's partition columns (without [[GSN]]; empty for an
    * unpartitioned component) and its live owners.
    */
  final case class Comp(partCols: Seq[String], owners: Seq[Owner])

  /** A resolved snapshot: the files it references are immutable for
    * at least the GC grace period, so every read through one manifest
    * object is a consistent point-in-time view of the layout.
    */
  final case class Manifest(base: String, id: Long,
                            comps: Map[String, Comp]) {

    /** True iff `comp` is live in this snapshot (has at least one
      * owner). The "delta segments exist" / "tombstones exist" test.
      */
    def has(comp: String): Boolean =
      comps.get(comp).exists(_.owners.nonEmpty)

    /** Read a live component as of this snapshot: one scan of its
      * stable directory with the ownership predicate as a static
      * partition filter (partition pruning evaluates it against
      * directory values; row-group pushdown and DPP on the real
      * partition columns are untouched). Fails loudly on a component
      * this snapshot does not carry.
      */
    def read(spark: SparkSession, comp: String): DataFrame = {
      val c = comps.getOrElse(comp, throw new IllegalStateException(
        s"snapshot $id of $base has no component '$comp'"))
      spark.read.parquet(s"$base/$comp")
        .filter(ownershipPred(c))
        .drop(GSN)
    }

    /** [[read]], or None when the component is absent from this
      * snapshot or physically empty (a component whose every owned
      * partition was written from an empty frame has directories but
      * no parquet files — unreadable, and semantically "no data").
      */
    def readOpt(spark: SparkSession, comp: String): Option[DataFrame] =
      if (!has(comp) || !IndexFS.hasParquetRecursive(s"$base/$comp")) None
      else Some(read(spark, comp))
  }

  private def ownershipPred(c: Comp): Column = {
    def tuplesPred(ts: Seq[Seq[String]]): Column =
      if (c.partCols.size == 1)
        col(c.partCols.head).cast("string").isin(ts.map(_.head): _*)
      else ts.map { t =>
        c.partCols.zip(t).map { case (p, v) =>
          col(p).cast("string") === lit(v)
        }.reduce(_ && _)
      }.reduce(_ || _)
    c.owners.map { o =>
      val g = col(GSN) === lit(o.gsn)
      o.include match {
        case Some(ts) => if (ts.isEmpty) lit(false) else g && tuplesPred(ts)
        case None =>
          if (o.exclude.isEmpty) g else g && !tuplesPred(o.exclude)
      }
    }.reduceOption(_ || _).getOrElse(lit(false))
  }

  // ------------------------------------------------------------------
  // Manifest codec: a line format with URL-encoded values (no JSON
  // library dependency, trivially diffable in a terminal).
  // ------------------------------------------------------------------

  private val header = "graft-snapshot v1"
  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    URLDecoder.decode(s, StandardCharsets.UTF_8)
  private def encTuples(ts: Seq[Seq[String]]): String =
    ts.map(_.map(enc).mkString("|")).mkString(";")
  private def decTuples(s: String): Seq[Seq[String]] =
    if (s.isEmpty) Nil
    else s.split(";", -1).toSeq.map(_.split("\\|", -1).toSeq.map(dec))

  private def render(m: Manifest): String = {
    val sb = new StringBuilder(header).append('\n')
    m.comps.toSeq.sortBy(_._1).foreach { case (name, c) =>
      sb.append(s"comp ${enc(name)} partCols=")
        .append(if (c.partCols.isEmpty) "-"
                else c.partCols.map(enc).mkString(",")).append('\n')
      c.owners.foreach { o =>
        val (mode, vals) = o.include match {
          case Some(ts) => ("include", encTuples(ts))
          case None     => ("exclude", encTuples(o.exclude))
        }
        sb.append(s"own gsn=${o.gsn} mode=$mode vals=$vals").append('\n')
      }
    }
    sb.toString
  }

  private def parse(base: String, id: Long, txt: String): Manifest = {
    val lines = txt.linesIterator.toSeq
    scala.Predef.require(lines.headOption.contains(header),
      s"snapshot manifest $id of $base: unrecognized header " +
        s"'${lines.headOption.getOrElse("")}'")
    var comps = Vector.empty[(String, Comp)]
    lines.drop(1).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("comp ")) {
        val rest = line.stripPrefix("comp ")
        val sp = rest.indexOf(" partCols=")
        val name = dec(rest.substring(0, sp))
        val pcs = rest.substring(sp + " partCols=".length)
        val partCols =
          if (pcs == "-") Nil else pcs.split(",").toSeq.map(dec)
        comps :+= (name -> Comp(partCols, Vector.empty))
      } else if (line.startsWith("own ")) {
        scala.Predef.require(comps.nonEmpty,
          s"manifest $id of $base: owner before comp")
        val kv = line.stripPrefix("own ").split(" ", 3)
        val gsn = kv(0).stripPrefix("gsn=").toLong
        val mode = kv(1).stripPrefix("mode=")
        val vals = decTuples(kv(2).stripPrefix("vals="))
        val o =
          if (mode == "include") Owner(gsn, Some(vals), Nil)
          else Owner(gsn, None, vals)
        val (n, c) = comps.last
        comps = comps.init :+ (n -> c.copy(owners = c.owners :+ o))
      } else throw new IllegalStateException(
        s"manifest $id of $base: unrecognized line '$line'")
    }
    Manifest(base, id, comps.toMap)
  }

  private def manifestName(id: Long): String = f"m$id%012d"
  private def parseId(name: String): Option[Long] =
    if (name.length == 13 && name.head == 'm' && name.tail.forall(_.isDigit))
      Some(name.tail.toLong)
    else None

  /** Ids of all published manifests of `base`, ascending. */
  private def manifestIds(base: String): Seq[Long] =
    IndexFS.listNames(manifestDir(base)).flatMap(parseId).sorted

  /** True iff `base` is snapshot-managed (has at least one manifest). */
  def enabled(base: String): Boolean = manifestIds(base).nonEmpty

  /** Resolve the latest published snapshot of `base`, if any. */
  def current(base: String): Option[Manifest] =
    manifestIds(base).lastOption.map(id => load(base, id))

  /** Resolve the latest snapshot; fail loudly when the layout has
    * none (callers run after a build gate, so absence is a bug or a
    * foreign directory, not a state to paper over).
    */
  def require(base: String): Manifest =
    current(base).getOrElse(throw new IllegalStateException(
      s"stored layout $base has no published snapshot manifest"))

  /** True iff the layout at `base` cannot be served as-is and must go
    * through its build path's wipe-and-rebuild: an OLDER same-kind
    * `_VERSION`, or layout content with no snapshot manifest (a
    * pre-snapshot layout, or one whose manifest directory was lost —
    * either way unreadable under the current contract). Newer/foreign
    * versions still throw from [[IndexFS.versionState]].
    */
  def layoutStale(base: String, kind: String): Boolean =
    IndexFS.versionState(base, kind) == IndexFS.VersionStale ||
      (!enabled(base) && IndexFS.listNames(base)
        .exists(n => !n.startsWith("_") && !n.startsWith(".")))

  private def load(base: String, id: Long): Manifest = {
    val path = s"${manifestDir(base)}/${manifestName(id)}"
    val txt = IndexFS.readStringOpt(path).getOrElse(
      throw new IllegalStateException(s"cannot read manifest $path"))
    parse(base, id, txt)
  }

  // ------------------------------------------------------------------
  // Writer side. All under the layout's writer lease.
  // ------------------------------------------------------------------

  /** Start a snapshot transaction against the latest manifest (or an
    * empty one). Caller must hold the layout's writer lease —
    * manifest numbering and ownership arithmetic assume one writer.
    */
  def begin(base: String): Txn = {
    scala.Predef.require(IndexFS.holdsLease(base),
      s"Snapshot.begin($base) outside the layout's writer lease")
    new Txn(base, current(base))
  }

  /** A snapshot transaction: data writes land under a fresh random
    * generation stamp as they are issued (never touching live files);
    * ownership mutations accumulate in memory; [[Txn.commit]] flips
    * them live with one atomic manifest publish, then GCs.
    */
  final class Txn private[Snapshot] (val base: String,
                                     prev: Option[Manifest]) {
    /** This transaction's generation stamp: random, so leaves from a
      * crashed predecessor can never collide with ours.
      */
    val gsn: Long = {
      val u = java.util.UUID.randomUUID()
      (u.getMostSignificantBits ^ u.getLeastSignificantBits) & Long.MaxValue
    }
    private val nextId: Long = prev.map(_.id + 1).getOrElse(1L)
    private var comps: Map[String, Comp] =
      prev.map(_.comps).getOrElse(Map.empty)
    private var committed = false

    /** One data write into a hidden staging directory, one rename
      * into place as `comp/gsn=<stamp>`. The staged subtree is
      * invisible to every reader until the manifest publish: readers
      * only select stamps their resolved manifest owns.
      */
    private def stageIn(df: DataFrame, comp: String,
                        partCols: Seq[String]): Unit = {
      val stage = s"$base/.staging/$gsn-${URLEncoder.encode(comp,
        StandardCharsets.UTF_8)}"
      val w = df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      (if (partCols.isEmpty) w else w.partitionBy(partCols: _*))
        .parquet(stage)
      IndexFS.mkdirs(s"$base/$comp")
      val dst = s"$base/$comp/$GSN=$gsn"
      if (!IndexFS.rename(stage, dst))
        throw new java.io.IOException(
          s"snapshot stage rename $stage -> $dst failed")
    }

    /** Write `df` as the component's complete new content: this stamp
      * owns every partition it carries (exclude-form owner — no
      * enumeration needed). The full-rebuild / small-artifact form.
      */
    def writeFull(df: DataFrame, comp: String, partCols: String*): Unit = {
      stageIn(df, comp, partCols)
      comps += comp -> Comp(partCols, Seq(Owner(gsn, None, Nil)))
    }

    /** Write `df` as the new content of exactly the partition-value
      * tuples `parts` (which must cover every partition `df` carries
      * — data written outside the claimed tuples would be invisible).
      * Prior owners lose those tuples; everything else is untouched.
      * The append / compact / scrub form: only affected partitions
      * get new bytes.
      */
    def writeParts(df: DataFrame, comp: String, partCols: Seq[String],
                   parts: Seq[Seq[String]]): Unit = {
      scala.Predef.require(parts.nonEmpty,
        s"writeParts($comp): empty partition claim")
      stageIn(df, comp, partCols)
      val old = comps.get(comp) match {
        case Some(c) =>
          scala.Predef.require(c.partCols == partCols,
            s"writeParts($comp): partCols ${partCols.mkString(",")} != " +
              s"manifest's ${c.partCols.mkString(",")}")
          c.owners
        case None => Nil
      }
      comps += comp -> Comp(partCols,
        subtract(old, parts) :+ Owner(gsn, Some(parts), Nil))
    }

    /** Remove the partition-value tuples `parts` from the component's
      * ownership without writing replacements — the "this partition's
      * rows all died" form (a dynamic overwrite cannot express an
      * emptied partition).
      */
    def dropParts(comp: String, parts: Seq[Seq[String]]): Unit =
      comps.get(comp).foreach { c =>
        val owners = subtract(c.owners, parts)
        if (owners.isEmpty) comps -= comp
        else comps += comp -> c.copy(owners = owners)
      }

    /** Remove a component from the snapshot entirely (cleared
      * tombstones, folded delta segments).
      */
    def dropComp(comp: String): Unit = comps -= comp

    /** Remove every partition tuple starting with `prefix` from the
      * component's ownership — how a replayed LSM segment supersedes
      * its own previous claim no matter which partitions the old
      * write covered. Only valid on components whose owners are all
      * include-form (delta components by construction): an
      * exclude-form owner's prefix complement has no finite
      * representation.
      */
    def dropPrefix(comp: String, prefix: Seq[String]): Unit =
      comps.get(comp).foreach { c =>
        val owners = c.owners.flatMap { o =>
          o.include match {
            case Some(ts) =>
              val kept = ts.filterNot(_.startsWith(prefix))
              if (kept.isEmpty) None else Some(o.copy(include = Some(kept)))
            case None => throw new IllegalStateException(
              s"dropPrefix($comp): component has a full-ownership " +
                "(exclude-form) owner — prefix subtraction is only " +
                "defined on enumerated claims")
          }
        }
        if (owners.isEmpty) comps -= comp
        else comps += comp -> c.copy(owners = owners)
      }

    private def subtract(owners: Seq[Owner],
                         parts: Seq[Seq[String]]): Seq[Owner] = {
      val ps = parts.toSet
      owners.flatMap { o =>
        o.include match {
          case Some(ts) =>
            val kept = ts.filterNot(ps)
            if (kept.isEmpty) None else Some(o.copy(include = Some(kept)))
          case None =>
            Some(o.copy(exclude = (o.exclude ++ parts).distinct))
        }
      }
    }

    /** Publish the accumulated state as the next manifest (atomic
      * exclusive create — the commit point), then garbage-collect
      * generations unreferenced by the kept manifests and older than
      * the grace period. `onStep` is a fault-injection hook for the
      * crash-window specs: (1) data written, not yet published;
      * (2) published — the new snapshot is live; (3) GC done.
      */
    def commit(onStep: Int => Unit = _ => ()): Manifest = {
      scala.Predef.require(!committed, s"snapshot txn on $base: double commit")
      committed = true
      onStep(1)
      val m = Manifest(base, nextId, comps)
      val path = s"${manifestDir(base)}/${manifestName(nextId)}"
      IndexFS.mkdirs(manifestDir(base))
      // write-then-rename: a manifest must become VISIBLE only with
      // its full content (a bare exclusive create exposes the file
      // before the bytes land, and a racing reader listing the
      // directory at that instant would parse a partial manifest).
      // The tmp name starts with '.' so readers' id listing never
      // considers it; rename-refuses-to-overwrite keeps the
      // exclusive-create safety against a broken lease.
      val tmp = s"${manifestDir(base)}/.m$nextId.$gsn.tmp"
      IndexFS.writeString(tmp, render(m))
      if (!IndexFS.rename(tmp, path))
        throw new IllegalStateException(
          s"snapshot publish of $path lost a rename race — another " +
            "writer published under our lease (broken lease?)")
      onStep(2)
      gc(base)
      onStep(3)
      m
    }
  }

  // ------------------------------------------------------------------
  // Garbage collection.
  // ------------------------------------------------------------------

  private def confLong(key: String, dflt: Long): Long =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption(key)).map(_.toLong).getOrElse(dflt)

  /** Reclaim generation leaves (and manifests) no kept manifest
    * references, provided they are older than the grace period — an
    * in-flight probe that resolved an older manifest finishes against
    * intact files. Keeps the newest `graft.snapshot.keepLast`
    * manifests (default 2); grace is `graft.snapshot.graceMs`
    * (default 10 min). Orphans from crashed writers age out the same
    * way. Safe to call any time under the writer lease.
    */
  def gc(base: String): Unit = {
    val keepLast = confLong("graft.snapshot.keepLast", 2L).toInt
    val graceMs = confLong("graft.snapshot.graceMs", 600000L)
    val ids = manifestIds(base)
    if (ids.isEmpty) return
    val kept = ids.takeRight(math.max(1, keepLast))
    val cutoff = System.currentTimeMillis() - graceMs
    val keptManifests = kept.map(load(base, _))
    // every (comp, gsn) a kept manifest references stays, coarsely:
    // one referenced partition keeps the stamp's whole component slice
    val referenced: Map[String, Set[Long]] = keptManifests
      .flatMap(_.comps.toSeq.flatMap { case (n, c) =>
        c.owners.map(o => n -> o.gsn)
      })
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    // candidate components: everything physically present except the
    // manifest dir, control files, and staging
    IndexFS.listNames(base)
      .filter(n => !n.startsWith("_") && !n.startsWith(".") &&
        IndexFS.isDirectory(s"$base/$n"))
      .foreach { compName =>
        val compDir = s"$base/$compName"
        val live = referenced.getOrElse(compName, Set.empty)
        IndexFS.listNames(compDir).foreach { leafName =>
          if (leafName.startsWith(s"$GSN=")) {
            val g = leafName.drop(GSN.length + 1).toLong
            val leaf = s"$compDir/$leafName"
            if (!live.contains(g) &&
                IndexFS.mtimeOf(leaf).exists(_ < cutoff))
              IndexFS.deleteRecursive(leaf)
          }
        }
        if (IndexFS.listNames(compDir).isEmpty)
          IndexFS.deleteRecursive(compDir)
      }
    // abandoned staging subtrees (crashed writers) age out the same way
    IndexFS.listNames(s"$base/.staging").foreach { n =>
      val p = s"$base/.staging/$n"
      if (IndexFS.mtimeOf(p).exists(_ < cutoff)) IndexFS.deleteRecursive(p)
    }
    // retire old manifest files past grace, and tmp files a crashed
    // publisher abandoned between write and rename
    ids.dropRight(math.max(1, keepLast)).foreach { id =>
      val p = s"${manifestDir(base)}/${manifestName(id)}"
      if (IndexFS.mtimeOf(p).exists(_ < cutoff)) IndexFS.deleteRecursive(p)
    }
    IndexFS.listNames(manifestDir(base)).filter(_.startsWith(".")).foreach {
      n =>
        val p = s"${manifestDir(base)}/$n"
        if (IndexFS.mtimeOf(p).exists(_ < cutoff)) IndexFS.deleteRecursive(p)
    }
  }
}
