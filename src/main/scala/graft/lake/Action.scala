package graft.lake

import org.json4s._
import org.json4s.jackson.Serialization

/** Actions recorded in the transaction log, one JSON line each.
  *
  * Modeled on the Delta Lake protocol (Armbrust et al., VLDB 2020; see
  * PAPERS.md) as exercised by the reference (delta_batch_etl and
  * delta_lake_rapid_start notebooks) — the
  * minimal action set backing append/overwrite (SURVEY §2 K1/K2),
  * snapshot + time-travel reads (S4/S6), history (D7), schema
  * enforcement/evolution (D9/D10) and MERGE/DELETE rewrites (D1–D5).
  */
sealed trait Action

/** Table-level metadata, re-emitted whenever the schema evolves or a
  * constraint is added/dropped.
  *
  * @param schemaDDL       full table schema as Spark DDL (includes
  *                        partition columns)
  * @param partitionColumns partition column names, in order
  * @param constraints     CHECK constraints: name → boolean SQL
  *                        expression every row must satisfy (Delta
  *                        `delta.constraints.*` analog). Absent in
  *                        pre-round-2 logs → default empty map.
  */
final case class Metadata(
    schemaDDL: String,
    partitionColumns: Seq[String] = Nil,
    createdTime: Long = 0L,
    constraints: Map[String, String] = Map.empty,
    properties: Map[String, String] = Map.empty) extends Action

/** A data file added to the table at some version.
  *
  * @param path            file path relative to the table root
  *                        (Hive-style `p_col=value/part-....parquet`)
  * @param partitionValues partition column → string value for this file
  * @param size            bytes
  * @param numRecords      row count (from the parquet footer)
  * @param minValues       per-column min (stringified), for data skipping
  * @param maxValues       per-column max (stringified), for data skipping
  * @param nullCounts      per-column null count, for IS NULL skipping
  * @param dvPath          deletion vector sidecar (table-relative path)
  *                        holding the ROW INDICES soft-deleted from
  *                        this file (Delta deletion-vector analog);
  *                        None = every physical row is live. A DV
  *                        delete re-adds the same `path` with a new
  *                        descriptor — replay replaces by path, so no
  *                        RemoveFile is needed for the supersession.
  * @param dvCardinality   number of indices in the DV (0 when absent);
  *                        live rows = numRecords - dvCardinality
  * @param bloomPath       bloom-filter sidecar (table-relative path)
  *                        holding per-column bloom filters over this
  *                        file's values ([[BloomIndex]]); None = no
  *                        index. Pure skipping metadata: a reader
  *                        that ignores it is correct, just opens
  *                        files a bloom could have excluded.
  * @param baseRowId       first row id of this file's id range (Delta
  *                        row tracking's `baseRowId`): physical row i
  *                        of the file has stable id `baseRowId + i`,
  *                        unless the file carries a materialized
  *                        [[RowTracking.COL]] column (written by
  *                        reorganizing rewrites), which wins.
  *                        Assigned once at commit time from the
  *                        [[RowTracking.DOMAIN]] high-water mark;
  *                        None on tables without the feature.
  * @param clusterGen      clustering generation (Delta liquid's ZCUBE
  *                        id analog): set on files written by a
  *                        clustering OPTIMIZE — files sharing a
  *                        generation are range-disjoint on the
  *                        cluster key. None = never clustered
  *                        (plain appends, DML rewrite output), the
  *                        set an INCREMENTAL OPTIMIZE re-clusters.
  */
final case class AddFile(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    size: Long = 0L,
    numRecords: Long = -1L,
    minValues: Map[String, String] = Map.empty,
    maxValues: Map[String, String] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty,
    dvPath: Option[String] = None,
    dvCardinality: Long = 0L,
    bloomPath: Option[String] = None,
    baseRowId: Option[Long] = None,
    clusterGen: Option[Long] = None) extends Action

/** A data file logically removed (tombstone retained until VACUUM). */
final case class RemoveFile(
    path: String,
    deletionTimestamp: Long) extends Action

/** A change-data file (Delta `cdc` action): the row-level changes of
  * this commit, written by DELETE/UPDATE at DML time under
  * `_change_data/`. Not part of the live table state — only
  * `LakeTable.changes` reads them, making CDC reads O(changes)
  * instead of O(rewritten data). Commits without cdc files (MERGE,
  * OPTIMIZE, plain appends) fall back to the read-time diff.
  */
final case class CdcFile(
    path: String,
    size: Long = 0L,
    numRecords: Long = -1L) extends Action

/** Audit record per commit — backs DESCRIBE HISTORY (SURVEY §2 D7).
  *
  * @param version set (≥ 0) only in aggregated history sidecars, where
  *                the entry is divorced from its version file; inside
  *                a version file the filename is the version and this
  *                stays -1. Absent in older logs → default.
  */
final case class CommitInfo(
    timestamp: Long,
    operation: String,
    operationParameters: Map[String, String] = Map.empty,
    version: Long = -1L) extends Action

/** Protocol versioning + feature gating (Delta `protocol` action): a
  * reader/writer must refuse a table whose log demands a version or
  * feature it does not implement — silently misreading a log written
  * under unknown semantics (e.g. ignoring deletion vectors it does not
  * understand) would return WRONG DATA, not an error. Absent in older
  * logs → implicit (1, 1) with no features.
  */
final case class Protocol(
    minReaderVersion: Int = 1,
    minWriterVersion: Int = 1,
    readerFeatures: Seq[String] = Nil,
    writerFeatures: Seq[String] = Nil) extends Action

/** Table-scoped named metadata outside the schema (Delta
  * `domainMetadata`): a (domain → configuration) entry replayed
  * last-writer-wins, `removed = true` tombstoning the domain. Exists
  * because some table state must survive checkpoints WITHOUT riding
  * [[Metadata.properties]] — a per-commit counter stored in properties
  * would make every append a metadata change and trip the
  * metadata-conflict abort for concurrent writers. First user:
  * [[RowTracking]]'s row-id high-water mark.
  */
final case class DomainMetadata(
    domain: String,
    configuration: Map[String, String] = Map.empty,
    removed: Boolean = false) extends Action

/** Idempotent-writer watermark (Delta `txn`/SetTransaction): records
  * that application `appId` has committed through `version` of ITS OWN
  * sequence (e.g. a streaming query's micro-batch id). A writer that
  * replays an already-committed version skips the write — this is what
  * makes foreachBatch sinks exactly-once across restarts.
  */
final case class Txn(
    appId: String,
    version: Long) extends Action

/** Reference to one checkpoint SIDECAR file (Delta v2-checkpoint
  * `sidecar` action analog): a parquet file under the log's
  * `_sidecars/` directory holding a disjoint slice of the live
  * AddFile set. Appears ONLY inside `<v>.checkpoint.manifest.json`
  * manifests — never in version files — and lets an incremental
  * checkpoint carry unchanged slices forward by reference instead of
  * re-serializing the full 10⁷-AddFile state every cadence.
  *
  * @param path  log-directory-relative path (`_sidecars/<name>.parquet`)
  * @param count AddFile entries inside (summary arithmetic + merge
  *              planning without opening the file)
  * @param bytes serialized size (merge planning)
  */
final case class SidecarRef(
    path: String,
    count: Long,
    bytes: Long = 0L) extends Action

/** One log line: an envelope with exactly one field set (Delta-style). */
private[lake] final case class LogEntry(
    metaData: Option[Metadata] = None,
    add: Option[AddFile] = None,
    remove: Option[RemoveFile] = None,
    commitInfo: Option[CommitInfo] = None,
    txn: Option[Txn] = None,
    cdc: Option[CdcFile] = None,
    protocol: Option[Protocol] = None,
    domainMetadata: Option[DomainMetadata] = None,
    sidecar: Option[SidecarRef] = None)

object Action {
  private implicit val formats: Formats = DefaultFormats

  /** Serialize one action to its log line. The two BULK types —
    * AddFile and RemoveFile, of which a 100k-file commit or
    * checkpoint carries 100k while every other type appears a handful
    * of times — take a hand-built writer: json4s' reflective
    * `Serialization.write` costs ~10 µs/action, which at 10⁶ files is
    * ~10 s of DRIVER time per big commit (SCALE.md's measured
    * write-side cost; VERDICT r12 ask #4). The hand path emits the
    * same shape `fromJson` reads (field order irrelevant to the
    * parser; None fields omitted, exactly as json4s does) and is
    * differentially tested against the reflective writer.
    */
  def toJson(a: Action): String = a match {
    case f: AddFile    => addFileJson(f)
    case r: RemoveFile =>
      val sb = new java.lang.StringBuilder(64 + r.path.length)
      sb.append("{\"remove\":{\"path\":")
      appendEsc(sb, r.path)
      sb.append(",\"deletionTimestamp\":").append(r.deletionTimestamp)
      sb.append("}}").toString
    case other => toJsonReflect(other)
  }

  /** The reflective (json4s) writer — reference implementation the
    * fast paths are differentially tested against, and the fallback
    * for the low-volume action types.
    */
  private[lake] def toJsonReflect(a: Action): String =
    Serialization.write(a match {
      case m: Metadata   => LogEntry(metaData = Some(m))
      case f: AddFile    => LogEntry(add = Some(f))
      case r: RemoveFile => LogEntry(remove = Some(r))
      case c: CommitInfo => LogEntry(commitInfo = Some(c))
      case t: Txn        => LogEntry(txn = Some(t))
      case c: CdcFile    => LogEntry(cdc = Some(c))
      case p: Protocol   => LogEntry(protocol = Some(p))
      case d: DomainMetadata => LogEntry(domainMetadata = Some(d))
      case s: SidecarRef => LogEntry(sidecar = Some(s))
    })

  private def appendEsc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') sb.append("\\\"")
      else if (c == '\\') sb.append("\\\\")
      else if (c == '\n') sb.append("\\n")
      else if (c == '\r') sb.append("\\r")
      else if (c == '\t') sb.append("\\t")
      else if (c < ' ') sb.append(f"\\u${c.toInt}%04x")
      else sb.append(c)
      i += 1
    }
    sb.append('"')
    ()
  }

  private def appendStrMap(sb: java.lang.StringBuilder, name: String,
      m: Map[String, String]): Unit = {
    sb.append(',').append('"').append(name).append("\":{")
    var first = true
    m.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      appendEsc(sb, k); sb.append(':')
      // null VALUES are real data: a null partition value's
      // partitionValues entry is (col -> null), and the reflective
      // writer emits JSON null for it
      if (v == null) sb.append("null") else appendEsc(sb, v)
    }
    sb.append('}')
    ()
  }

  private def addFileJson(f: AddFile): String = {
    val sb = new java.lang.StringBuilder(192 + f.path.length)
    sb.append("{\"add\":{\"path\":")
    appendEsc(sb, f.path)
    appendStrMap(sb, "partitionValues", f.partitionValues)
    sb.append(",\"size\":").append(f.size)
    sb.append(",\"numRecords\":").append(f.numRecords)
    appendStrMap(sb, "minValues", f.minValues)
    appendStrMap(sb, "maxValues", f.maxValues)
    sb.append(",\"nullCounts\":{")
    var first = true
    f.nullCounts.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      appendEsc(sb, k); sb.append(':').append(v)
    }
    sb.append('}')
    f.dvPath.foreach { p =>
      sb.append(",\"dvPath\":"); appendEsc(sb, p)
    }
    sb.append(",\"dvCardinality\":").append(f.dvCardinality)
    f.bloomPath.foreach { p =>
      sb.append(",\"bloomPath\":"); appendEsc(sb, p)
    }
    f.baseRowId.foreach(id => sb.append(",\"baseRowId\":").append(id))
    f.clusterGen.foreach(g => sb.append(",\"clusterGen\":").append(g))
    sb.append("}}").toString
  }

  /** Cheap envelope sniff: does this log line carry a
    * metadata-bearing action (Metadata / Protocol / DomainMetadata /
    * Txn — everything the metadata-light replay folds)? Both writers
    * emit the envelope field FIRST (json4s writes declaration order
    * with Nones omitted; the fast paths emit their key literally), so
    * a prefix check skips a commit's 10⁵ add lines without
    * JSON-parsing any of them.
    */
  private[lake] def isMetaLine(s: String): Boolean =
    s.startsWith("{\"metaData\"") || s.startsWith("{\"protocol\"") ||
      s.startsWith("{\"domainMetadata\"") || s.startsWith("{\"txn\"")

  /** [[isMetaLine]] as prefix strings, for
    * [[LogStore.readLinesWithPrefix]]'s byte-level filter.
    */
  private[lake] val MetaLinePrefixes: Seq[String] =
    Seq("{\"metaData\"", "{\"protocol\"", "{\"domainMetadata\"", "{\"txn\"")

  /** CommitInfo envelope prefix, for history extraction without
    * parsing a bulk commit's add lines.
    */
  private[lake] val CommitInfoPrefix: Seq[String] = Seq("{\"commitInfo\"")

  /** Parse one log line. The two BULK types take a hand-built
    * recursive-descent parser — the READ-side twin of [[toJson]]'s
    * round-13 writers: json4s' reflective extraction costs tens of µs
    * per AddFile line, which at a 10⁶-line checkpoint tail or commit
    * is MINUTES of single-core driver time (measured in the round-17
    * 10⁷ MetaScaleBench build loop, where the incremental cadence's
    * tail fold was json4s-bound). The fast parser is field-order
    * independent, skips unknown fields exactly like json4s, handles
    * every legal JSON escape, and is differentially tested against
    * the reflective parser on hostile strings; anything it cannot
    * shape-match (foreign whitespace, non-integer numerics) falls
    * back to the reflective path rather than erroring.
    */
  def fromJson(line: String): Action =
    if (line.startsWith("{\"add\":") || line.startsWith("{\"remove\":"))
      try parseBulk(line)
      catch { case _: FastParseException => fromJsonReflect(line) }
    else fromJsonReflect(line)

  /** The reflective (json4s) parser — reference implementation the
    * fast path is differentially tested against, and the fallback for
    * the low-volume action types.
    */
  private[lake] def fromJsonReflect(line: String): Action = {
    val e = Serialization.read[LogEntry](line)
    // AddFile is the BULK type: rebuild its stat/partition maps
    // compact and interned ([[Interned]]) — a replayed 10⁶-file
    // snapshot must not hold 10⁶ private copies of the column-name
    // strings and map structures json4s builds per line.
    e.metaData.orElse(e.add.map(Interned.addFile)).orElse(e.remove)
      .orElse(e.commitInfo)
      .orElse(e.txn).orElse(e.cdc).orElse(e.protocol)
      .orElse(e.domainMetadata).orElse(e.sidecar)
      .getOrElse(throw new IllegalArgumentException(
        s"unrecognized log line: $line"))
  }

  private final class FastParseException(msg: String)
      extends RuntimeException(msg)

  /** Minimal JSON cursor over the compact lines both writers emit.
    * Throws [[FastParseException]] on any shape surprise — the caller
    * falls back to the reflective parser, so a legal-but-unexpected
    * line degrades to the slow path instead of failing.
    */
  private final class Cursor(s: String) {
    var i: Int = 0
    def fail(msg: String): Nothing = throw new FastParseException(
      s"offset $i: $msg")
    def ws(): Unit = {
      while (i < s.length && {
        val c = s.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }) i += 1
    }
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def tryChar(c: Char): Boolean = {
      ws()
      if (i < s.length && s.charAt(i) == c) { i += 1; true } else false
    }
    def str(): String = {
      ws()
      if (i >= s.length || s.charAt(i) != '"') fail("expected string")
      i += 1
      var j = i // fast path: scan to the closing quote, no escapes
      while (j < s.length && s.charAt(j) != '"' && s.charAt(j) != '\\')
        j += 1
      if (j >= s.length) fail("unterminated string")
      if (s.charAt(j) == '"') {
        val out = s.substring(i, j); i = j + 1; return out
      }
      val sb = new java.lang.StringBuilder(j - i + 16)
      sb.append(s, i, j)
      i = j
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length) fail("dangling escape")
          i += 1
          s.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail("truncated \\u escape")
              // strict hex-digit loop: Integer.parseInt(_, 16) accepts
              // a sign ("\u+1AB"), which JSON (and json4s) rejects —
              // non-canonical input must take the reflective fallback
              var cp = 0
              var d = 1
              while (d <= 4) {
                val hc = s.charAt(i + d)
                val hv =
                  if (hc >= '0' && hc <= '9') hc - '0'
                  else if (hc >= 'a' && hc <= 'f') hc - 'a' + 10
                  else if (hc >= 'A' && hc <= 'F') hc - 'A' + 10
                  else fail("bad \\u escape")
                cp = (cp << 4) | hv
                d += 1
              }
              sb.append(cp.toChar)
              i += 4
            case other => fail(s"bad escape \\$other")
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      if (i >= s.length) fail("unterminated string")
      i += 1
      sb.toString
    }
    def strOrNull(): String = {
      ws()
      if (i < s.length && s.charAt(i) == 'n') {
        if (!s.startsWith("null", i)) fail("expected null")
        i += 4
        null
      } else str()
    }
    def long(): Long = {
      ws()
      val start = i
      // '-' only: JSON integers have no leading '+'; a '+' must take
      // the reflective fallback path like any other foreign input
      if (i < s.length && s.charAt(i) == '-')
        i += 1
      while (i < s.length && {
        val c = s.charAt(i); c >= '0' && c <= '9'
      }) i += 1
      if (i == start ||
          (i == start + 1 && (s.charAt(start) < '0' || s.charAt(start) > '9')))
        fail("expected integer")
      if (i < s.length && {
        val c = s.charAt(i); c == '.' || c == 'e' || c == 'E'
      }) fail("non-integer number") // foreign writer: reflective path
      try java.lang.Long.parseLong(s.substring(start, i))
      catch { case _: NumberFormatException => fail("integer overflow") }
    }
    def strMap(): Map[String, String] = {
      expect('{')
      if (tryChar('}')) return Map.empty
      val b = Map.newBuilder[String, String]
      var done = false
      while (!done) {
        val k = str(); expect(':'); b += (k -> strOrNull())
        done = !tryChar(',')
      }
      expect('}')
      b.result()
    }
    def longMap(): Map[String, Long] = {
      expect('{')
      if (tryChar('}')) return Map.empty
      val b = Map.newBuilder[String, Long]
      var done = false
      while (!done) {
        val k = str(); expect(':'); b += (k -> long())
        done = !tryChar(',')
      }
      expect('}')
      b.result()
    }
    def skipValue(): Unit = {
      ws()
      if (i >= s.length) fail("expected value")
      s.charAt(i) match {
        case '"' => str(); ()
        case '{' =>
          i += 1
          if (!tryChar('}')) {
            var done = false
            while (!done) {
              str(); expect(':'); skipValue()
              done = !tryChar(',')
            }
            expect('}')
          }
        case '[' =>
          i += 1
          if (!tryChar(']')) {
            var done = false
            while (!done) { skipValue(); done = !tryChar(',') }
            expect(']')
          }
        case 't' | 'f' | 'n' =>
          if (s.startsWith("true", i)) i += 4
          else if (s.startsWith("false", i)) i += 5
          else if (s.startsWith("null", i)) i += 4
          else fail("bad literal")
        case _ =>
          val start = i
          while (i < s.length && {
            val c = s.charAt(i)
            (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.' ||
              c == 'e' || c == 'E'
          }) i += 1
          if (i == start) fail("expected value")
      }
    }
  }

  private def parseBulk(line: String): Action = {
    val c = new Cursor(line)
    c.expect('{')
    val env = c.str()
    c.expect(':')
    c.expect('{')
    val isAdd = env == "add"
    if (!isAdd && env != "remove") c.fail(s"unexpected envelope $env")
    if (isAdd) {
      var path: String = null
      var pv: Map[String, String] = Map.empty
      var size = 0L
      var nr = -1L
      var mins: Map[String, String] = Map.empty
      var maxs: Map[String, String] = Map.empty
      var nc: Map[String, Long] = Map.empty
      var dv: Option[String] = None
      var dvc = 0L
      var bloom: Option[String] = None
      var bri: Option[Long] = None
      var cg: Option[Long] = None
      if (!c.tryChar('}')) {
        var done = false
        while (!done) {
          val k = c.str(); c.expect(':')
          k match {
            case "path"            => path = c.str()
            case "partitionValues" => pv = c.strMap()
            case "size"            => size = c.long()
            case "numRecords"      => nr = c.long()
            case "minValues"       => mins = c.strMap()
            case "maxValues"       => maxs = c.strMap()
            case "nullCounts"      => nc = c.longMap()
            case "dvPath"          => dv = Option(c.strOrNull())
            case "dvCardinality"   => dvc = c.long()
            case "bloomPath"       => bloom = Option(c.strOrNull())
            case "baseRowId"       => bri = Some(c.long())
            case "clusterGen"      => cg = Some(c.long())
            case _                 => c.skipValue() // forward-compat
          }
          done = !c.tryChar(',')
        }
        c.expect('}')
      }
      c.expect('}')
      if (path == null) c.fail("add without path")
      Interned.addFile(AddFile(path, pv, size, nr, mins, maxs, nc,
        dv, dvc, bloom, bri, cg))
    } else {
      var path: String = null
      var ts = 0L
      if (!c.tryChar('}')) {
        var done = false
        while (!done) {
          val k = c.str(); c.expect(':')
          k match {
            case "path"              => path = c.str()
            case "deletionTimestamp" => ts = c.long()
            case _                   => c.skipValue()
          }
          done = !c.tryChar(',')
        }
        c.expect('}')
      }
      c.expect('}')
      if (path == null) c.fail("remove without path")
      RemoveFile(path, ts)
    }
  }
}
