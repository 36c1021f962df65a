package graft

import graft.streaming.{IvfObs, StreamIvf}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamIvfSpec extends SparkSpec {

  test("stream_ivf_maintain batch gate matches the append census halves") {
    import org.apache.spark.sql.functions.col
    val stream = streaming.StreamScenarios.streamIvfMaintain(spark, sf)
      .collect().map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_appended"))).toMap
    val batch = operators.Similarity.ivfAppend(spark, sf)
      .collect().map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_appended"))).toMap
    assert(stream == batch,
      "maintained census must equal the batch audit's count columns")
  }

  test("streaming census: counters accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IvfObs]
    val query = StreamIvf.census(input.toDS())
      .writeStream.format("memory").queryName("ivf_census")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: the index as built — two cells, base members only
      input.addData(IvfObs(10, 0), IvfObs(10, 0), IvfObs(20, 0))
      query.processAllAvailable()
      // batch 2: an append batch concentrating on cell 10
      input.addData(IvfObs(10, 1), IvfObs(10, 1), IvfObs(20, 1))
      query.processAllAvailable()
      // batch 3: a later append touching only cell 10
      input.addData(IvfObs(10, 1))
      query.processAllAvailable()
      val last = spark.table("ivf_census").collect()
        .groupBy(_.getAs[Long]("cell"))
        .view.mapValues(_.maxBy(r =>
          r.getAs[Long]("n_base") + r.getAs[Long]("n_appended"))).toMap
      assert(last(10L).getAs[Long]("n_base") == 2L)
      assert(last(10L).getAs[Long]("n_appended") == 3L)
      assert(last(20L).getAs[Long]("n_base") == 1L)
      assert(last(20L).getAs[Long]("n_appended") == 1L)
    } finally query.stop()
  }
}
