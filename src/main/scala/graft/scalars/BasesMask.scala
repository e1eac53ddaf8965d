package graft.scalars

import graft.sources.RunInfoXml.ReadInfo

/** Bases-mask computation for demultiplexing (basesMask.py:20-99).
  *
  * Inputs are two tiny artifacts (samplesheet index-length census + RunInfo
  * cycle layout), so this is a pure driver-side scalar, exactly like the
  * reference. Behavior matched to the reference:
  *  - all non-zero samplesheet index columns must share one length;
  *  - per RunInfo read (in read order): data reads emit `y{cycles-offset}`
  *    (+`n{offset}` when a read offset is set); index reads beyond the
  *    samplesheet's index count are fully masked `n{cycles}`; otherwise the
  *    index emits `i{len}` with `n{offset}` where offset is the explicit
  *    index offset or the inferred cycles-minus-samplesheet-length gap.
  */
object BasesMask {

  def calculate(
      indexLengthCensus: Map[String, Map[Int, Long]],
      reads: Seq[ReadInfo],
      readOffset: Int = 0,
      indexOffset: Int = 0): String = {
    val indexLengths = indexLengthCensus.toSeq.sortBy(_._1).flatMap { case (colName, lens) =>
      val nonZero = lens.keySet.filter(_ > 0)
      if (lens.size > 1)
        throw new IllegalArgumentException(s"column $colName has variable index lengths: ${lens.keys.toSeq.sorted}")
      nonZero.headOption
    }
    if (indexLengths.distinct.size > 1)
      throw new IllegalArgumentException(s"index lengths differ across columns: $indexLengths")
    val sheetIndexCount = indexLengths.size
    val allowedLen = indexLengths.headOption.getOrElse(0)

    var indexSeen = 0
    val masks = reads.sortBy(_.number).map { r =>
      if (r.isIndexedRead) {
        indexSeen += 1
        val tempOffset =
          if (indexOffset == 0 && allowedLen < r.numCycles) r.numCycles - allowedLen else 0
        val realLen =
          if (tempOffset > 0) r.numCycles - tempOffset else r.numCycles - indexOffset
        if (realLen != allowedLen)
          throw new IllegalArgumentException(
            s"index length $realLen (read ${r.number}) does not match samplesheet length $allowedLen")
        if (indexSeen > sheetIndexCount) s"n${r.numCycles}"
        else if (tempOffset > 0) s"i${realLen}n$tempOffset"
        else if (indexOffset > 0) s"i${realLen}n$indexOffset"
        else s"i$realLen"
      } else {
        val realLen = r.numCycles - readOffset
        if (readOffset > 0) s"y${realLen}n$readOffset" else s"y$realLen"
      }
    }
    masks.mkString(",")
  }
}
