package graft.tools
object CcRepro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("32")
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.read.parquet(sys.props.getOrElse("cc.edges", "/tmp/cc_edges_sf01"))
    // warm-up
    graft.operators.Components.connectedComponents(edges).write
      .format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.operators.Components.connectedComponents(edges).write
        .format("noop").mode("overwrite").save()
      println(f"cc run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
