package graft.lake

/** What THIS engine implements, and the gates that refuse anything
  * beyond it (Delta protocol-versioning analog). The whole point is to
  * fail loudly instead of misreading: a reader that ignored a
  * deletion-vector descriptor it did not understand would silently
  * resurrect deleted rows.
  */
object LakeProtocol {

  /** Highest reader/writer protocol version this engine implements. */
  val SUPPORTED_READER_VERSION = 3
  val SUPPORTED_WRITER_VERSION = 3

  val FEATURE_DELETION_VECTORS = "deletionVectors"
  val FEATURE_COLUMN_MAPPING = "columnMapping"

  /** WRITER-only (Delta's rowTracking): an unaware reader still reads
    * correct data — it just cannot see row ids — but an unaware
    * writer would fail to maintain the id high-water mark and the
    * rewrite materialization, so writers are fenced.
    */
  val FEATURE_ROW_TRACKING = "rowTracking"

  /** Reader+writer (Delta's typeWidening): after ALTER COLUMN TYPE,
    * existing files keep the NARROWER physical type and readers must
    * upcast at scan time — an unaware reader would refuse the
    * file/schema mismatch (or misread it), so readers are fenced.
    */
  val FEATURE_TYPE_WIDENING = "typeWidening"

  val SUPPORTED_READER_FEATURES: Set[String] =
    Set(FEATURE_DELETION_VECTORS, FEATURE_COLUMN_MAPPING,
      FEATURE_TYPE_WIDENING)
  val SUPPORTED_WRITER_FEATURES: Set[String] =
    Set(FEATURE_DELETION_VECTORS, FEATURE_COLUMN_MAPPING,
      FEATURE_ROW_TRACKING, FEATURE_TYPE_WIDENING)

  /** The protocol a type-widened table additionally requires. */
  val typeWideningProtocol: Protocol = Protocol(3, 3,
    readerFeatures = Seq(FEATURE_TYPE_WIDENING),
    writerFeatures = Seq(FEATURE_TYPE_WIDENING))

  /** The protocol a table with `props` requires. Feature-bearing
    * tables use version 3 (feature-list form); plain tables stay at
    * the implicit (1, 1). Both features gate READERS too: an unaware
    * engine would resurrect DV-deleted rows or null-out renamed
    * columns.
    */
  def requiredFor(props: Map[String, String]): Protocol = {
    val features = Seq(
      FEATURE_DELETION_VECTORS ->
        props.get(LakeTable.PROP_ENABLE_DV).contains("true"),
      FEATURE_COLUMN_MAPPING -> ColumnMapping.enabled(props)
    ).collect { case (f, true) => f }
    val writerOnly = Seq(
      FEATURE_ROW_TRACKING -> RowTracking.enabled(props)
    ).collect { case (f, true) => f }
    if (features.isEmpty && writerOnly.isEmpty) Protocol()
    else Protocol(3, 3,
      readerFeatures = features,
      writerFeatures = features ++ writerOnly)
  }

  /** `current` upgraded (never downgraded) to also satisfy `needed` —
    * Delta semantics: versions and features only ratchet up.
    */
  def upgraded(current: Protocol, needed: Protocol): Protocol =
    Protocol(
      math.max(current.minReaderVersion, needed.minReaderVersion),
      math.max(current.minWriterVersion, needed.minWriterVersion),
      (current.readerFeatures ++ needed.readerFeatures).distinct,
      (current.writerFeatures ++ needed.writerFeatures).distinct)

  def assertReadable(p: Protocol, tablePath: String): Unit = {
    if (p.minReaderVersion > SUPPORTED_READER_VERSION)
      throw new IllegalStateException(
        s"cannot read lake table $tablePath: its log requires reader " +
        s"protocol version ${p.minReaderVersion}, this engine supports " +
        s"up to $SUPPORTED_READER_VERSION")
    val unknown = p.readerFeatures.filterNot(SUPPORTED_READER_FEATURES)
    if (unknown.nonEmpty)
      throw new IllegalStateException(
        s"cannot read lake table $tablePath: its log requires reader " +
        s"feature(s) ${unknown.mkString(", ")} this engine does not " +
        s"implement (supported: ${SUPPORTED_READER_FEATURES.mkString(", ")})")
  }

  def assertWritable(p: Protocol, tablePath: String): Unit = {
    if (p.minWriterVersion > SUPPORTED_WRITER_VERSION)
      throw new IllegalStateException(
        s"cannot write lake table $tablePath: its log requires writer " +
        s"protocol version ${p.minWriterVersion}, this engine supports " +
        s"up to $SUPPORTED_WRITER_VERSION")
    val unknown = p.writerFeatures.filterNot(SUPPORTED_WRITER_FEATURES)
    if (unknown.nonEmpty)
      throw new IllegalStateException(
        s"cannot write lake table $tablePath: its log requires writer " +
        s"feature(s) ${unknown.mkString(", ")} this engine does not " +
        s"implement (supported: ${SUPPORTED_WRITER_FEATURES.mkString(", ")})")
  }
}
