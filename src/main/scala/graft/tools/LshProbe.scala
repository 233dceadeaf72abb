package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-by-stage timing of the minhash-LSH pipeline (diagnostic main). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32, "graft-lshprobe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[lshprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }

    val ts = docs.select(col("doc_id"),
      array_sort(array_distinct(Dedup.toks(col("text")))).as("ts"))
    val groups = ts.groupBy("ts")
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .withColumn("sid", element_at(col("members"), 1))
    time("groups")(groups.count())
    time("groups2")(groups.count())

    val tok = groups.select(col("sid"), explode(col("ts")).as("term"))
      .withColumn("h", Dedup.h32(col("term")))
    val hashes = (0 until Dedup.NumHashes).map { j =>
      min((col("h") * Dedup.hashA(j) + Dedup.hashB(j)) % Dedup.MinhashP).as(s"mh$j")
    }
    val mh = tok.groupBy("sid").agg(hashes.head, hashes.tail: _*)
      .select(col("sid"), array((0 until Dedup.NumHashes).map(j => col(s"mh$j")): _*).as("mhs"))
    time("mh")(mh.count())
    val numBands = Dedup.NumHashes / Dedup.BandRows
    def bandSlice(side: String, b: Int) =
      slice(col(s"$side.mhs"), b * Dedup.BandRows + 1, Dedup.BandRows)
    val bands = (0 until numBands).map { b =>
      mh.select(col("sid"), col("mhs"), lit(b).as("band"),
        slice(col("mhs"), b * Dedup.BandRows + 1, Dedup.BandRows).as("sig"))
    }.reduce(_ unionAll _)
    time("bands")(bands.count())
    val raw = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.sid") < col("y.sid"))
    time("raw_join")(raw.count())
    val firstBand = coalesce(
      (0 until numBands).map(b => when(bandSlice("x", b) === bandSlice("y", b), lit(b))): _*)
    val cand = raw.filter(col("x.band") === firstBand)
      .select(col("x.sid").as("sa"), col("y.sid").as("sb"))
    time("cand")(cand.count())
    val joined = cand
      .join(groups.select(col("sid").as("sa"), col("ts").as("tsa"), col("members").as("ma")), "sa")
      .join(groups.select(col("sid").as("sb"), col("ts").as("tsb"), col("members").as("mb")), "sb")
      .select(col("tsa"), col("tsb"), col("ma"), col("mb"))
    time("joined")(joined.count())
    val expanded = joined.as[(Array[String], Array[String], Array[Long], Array[Long])]
      .flatMap { case (tsa, tsb, ma, mb) =>
        val jv = Dedup.jaccardOf(tsa, tsb)
        if (jv < 0.95) Iterator.empty
        else for { da <- ma.iterator; db <- mb.iterator }
          yield (math.min(da, db), math.max(da, db), jv)
      }
    time("expanded")(expanded.count())
    time("full")(Dedup.minhashLsh(docs, 0.95).count())
    time("full2")(Dedup.minhashLsh(docs, 0.95).count())
    spark.stop()
  }
}
