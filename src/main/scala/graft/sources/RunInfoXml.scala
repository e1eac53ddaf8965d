package graft.sources

/** RunInfo.xml / RunParameters.xml readers (runinfo_xml.py:15-134,
  * runparameters_xml.py:1-108). Tiny per-run files → driver-side scala-xml;
  * results are plain case classes broadcast to any distributed stage that
  * needs the cycle layout. */
object RunInfoXml {

  final case class ReadInfo(
      number: Int,
      numCycles: Int,
      isIndexedRead: Boolean,
      isReverseComplement: Option[Boolean])

  final case class RunInfo(
      runId: String,
      flowcell: String,
      instrument: String,
      date: String,
      laneCount: Int,
      surfaceCount: Int,
      reads: Seq[ReadInfo],
      tiles: Seq[String])

  def parse(xmlText: String): RunInfo = {
    val root = scala.xml.XML.loadString(xmlText)
    val run = (root \ "Run").headOption.getOrElse(root)
    val layout = run \ "FlowcellLayout"
    def attr(n: scala.xml.NodeSeq, a: String): String =
      n.headOption.map(_.attribute(a).map(_.text).getOrElse("")).getOrElse("")
    val reads = (run \ "Reads" \ "Read").map { r =>
      ReadInfo(
        number = r.attribute("Number").map(_.text.toInt).getOrElse(0),
        numCycles = r.attribute("NumCycles").map(_.text.toInt).getOrElse(0),
        isIndexedRead = r.attribute("IsIndexedRead").exists(_.text.equalsIgnoreCase("Y")),
        isReverseComplement = r.attribute("IsReverseComplement")
          .map(_.text.equalsIgnoreCase("Y")))
    }
    RunInfo(
      runId = attr(run, "Id"),
      flowcell = (run \ "Flowcell").text,
      instrument = (run \ "Instrument").text,
      date = (run \ "Date").text,
      laneCount = attr(layout, "LaneCount") match { case "" => 0; case s => s.toInt },
      surfaceCount = attr(layout, "SurfaceCount") match { case "" => 0; case s => s.toInt },
      reads = reads,
      tiles = (run \\ "Tile").map(_.text))
  }

  def read(path: String): RunInfo =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** RunParameters.xml (runparameters_xml.py:1-108): a flat bag of
    * settings — flatten every leaf element to (path, text). Nested
    * duplicates keep the last value, like a dict build. */
  def parseParams(xmlText: String): Map[String, String] = {
    val root = scala.xml.XML.loadString(xmlText)
    def walk(n: scala.xml.Node, prefix: String): Seq[(String, String)] = {
      val children = n.child.filter(_.isInstanceOf[scala.xml.Elem])
      if (children.isEmpty) {
        val t = n.text.trim
        if (t.nonEmpty) Seq(prefix -> t) else Nil
      } else children.flatMap(c => walk(c, if (prefix.isEmpty) c.label else s"$prefix/${c.label}"))
    }
    walk(root, "").toMap
  }

  def readParams(path: String): Map[String, String] =
    parseParams(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
