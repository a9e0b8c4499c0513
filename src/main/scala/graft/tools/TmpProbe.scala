package graft.tools
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.config.Sessions.local("4")
    val df = graft.vec.VectorOps.queries("embed_quantize")(spark, "/tmp/nfworld")
    df.explain("formatted")
    spark.stop()
  }
}
