// Splittable multistream-bz2 ingest: single-task whole-file read vs the
// stream-boundary split read on ONE large file (tools/gen_multistream.py).
// Run: spark-shell --master 'local[16]' --driver-class-path target/scala-2.13/classes -i tools/wikibench_bz2.scala
val f = "/tmp/wikibench/multi.xml.bz2"
val src = "graft.sources.WikiXmlSource"
def mk(split: Boolean) =
  if (split)
    spark.read.format(src).option("bz2MinSplitBytes", 256L * 1024).load(f)
  else spark.read.format(src).option("splitBz2", false).load(f)
def run(label: String, df: org.apache.spark.sql.DataFrame): Double = {
  val t0 = System.nanoTime
  val n = df.select("title", "rev_ord").count()
  val dt = (System.nanoTime - t0) / 1e9
  println(f"$label%-8s $n rows, ${df.rdd.getNumPartitions} partitions, $dt%.1f s")
  dt
}
run("warmup", mk(split = true)) // JIT + page-cache warm before timing
val single = run("single", mk(split = false))
val split = run("split", mk(split = true))
println(f"SPEEDUP: ${single / split}%.1f x")
sys.exit(0)
