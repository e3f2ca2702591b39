package graft.cdc.split

/** T5 — checkpointable split state, the analog of the reference's split /
  * pending-splits state serializers (MySqlSplitSerializer,
  * PendingSplitsStateSerializer; flink-connector-mysql-cdc/.../source/split/).
  * In the Spark build this state rides in Structured Streaming checkpoints
  * or a driver-side plan file; the codec below is a versioned, escaped
  * line format with exact round-tripping (property-tested like
  * MySqlSplitSerializerTest).
  */
object SplitState {

  final case class SnapshotSplit(
      splitId: String,
      tableId: String,
      splitStart: Option[Long], // None = unbounded (first split)
      splitEnd: Option[Long],   // None = unbounded (last split)
      highWatermark: Long
  )

  final case class StreamSplit(
      startingOffset: Long,
      finishedSplits: Seq[SnapshotSplit]
  )

  private val Version = 1

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("|", "\\p").replace("\n", "\\n")

  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\')
          case 'p' => b.append('|')
          case 'n' => b.append('\n')
          case o => b.append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def optL(o: Option[Long]): String = o.map(_.toString).getOrElse("")
  private def parseOptL(s: String): Option[Long] = if (s.isEmpty) None else Some(s.toLong)

  def serializeSnapshot(s: SnapshotSplit): String =
    Seq(Version.toString, esc(s.splitId), esc(s.tableId),
      optL(s.splitStart), optL(s.splitEnd), s.highWatermark.toString).mkString("|")

  def deserializeSnapshot(line: String): SnapshotSplit = {
    // -1 keeps trailing empty fields (unbounded split ends)
    val parts = splitEscaped(line)
    require(parts.head.toInt == Version, s"unknown split-state version ${parts.head}")
    SnapshotSplit(unesc(parts(1)), unesc(parts(2)),
      parseOptL(parts(3)), parseOptL(parts(4)), parts(5).toLong)
  }

  /** Split on unescaped '|' only. */
  private def splitEscaped(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val b = new StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) { b.append(c).append(line.charAt(i + 1)); i += 2 }
      else if (c == '|') { out += b.toString; b.clear(); i += 1 }
      else { b.append(c); i += 1 }
    }
    out += b.toString
    out.result()
  }

  def serializeStream(s: StreamSplit): String =
    (s.startingOffset.toString +: s.finishedSplits.map(serializeSnapshot))
      .map(esc).mkString("\n")

  def deserializeStream(text: String): StreamSplit = {
    val lines = text.split("\n", -1).toSeq.map(unesc)
    StreamSplit(lines.head.toLong, lines.tail.filter(_.nonEmpty).map(deserializeSnapshot))
  }
}
