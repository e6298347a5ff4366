import graft.sources.WikiXml
val t0 = System.nanoTime
val revs = WikiXml.read(spark, "/tmp/wikibench/*.xml")
val n = revs.count()
val t1 = System.nanoTime
val snaps = WikiXml.dailySnapshots(WikiXml.read(spark, "/tmp/wikibench/*.xml"))
val m = snaps.count()
val t2 = System.nanoTime
println(f"PARSE: $n revisions in ${(t1-t0)/1e9}%.1f s = ${177.6/((t1-t0)/1e9)}%.1f MB/s")
println(f"SNAPSHOT: $m rows in ${(t2-t1)/1e9}%.1f s end-to-end = ${177.6/((t2-t1)/1e9)}%.1f MB/s")
sys.exit(0)
