package graft

/** Regeneration tool for the `jpg_decode_real` oracle literals — run with
  * `sbt 'Test/runMain graft.JpgOracleGen'` after any deliberate change to
  * the JPEG codec or the fixture forms, and paste the printed VALUES rows
  * into SparkEntry's oracle SQL. The literals are FROZEN there on purpose:
  * the oracle pins the codec's cross-validated output (JpegSpec's
  * javax.imageio checks), so a codec regression fails the driver gate
  * instead of silently moving both sides.
  */
object JpgOracleGen {
  def main(args: Array[String]): Unit = {
    graft.operators.Multimodal.JpgForms.indices.foreach { f =>
      val (w, h, ch, hash, luma) = graft.operators.Multimodal.jpgFormStats(f)
      println(s"  ($f, $w, $h, $ch, '$hash', $luma),")
    }
  }
}
