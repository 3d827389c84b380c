package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage time/shuffle breakdown for named gates: runs one untimed
  * warm-up, then one profiled rep, printing every stage's wall time,
  * task count, shuffle read/write and spill — the "where does the
  * median actually go" view the Spark UI would give (ui is disabled in
  * the bench; this is the listener-based equivalent).
  *
  * Usage: runMain graft.tools.StageProfile <gate...>
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.builder()
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, ms: Long, tasks: Int,
                  shufReadMb: Double, shufWriteMb: Double,
                  inputMb: Double, spillMb: Double)
    val stages = ArrayBuffer.empty[St]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(90),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6,
            m.diskBytesSpilled / 1e6)
        }
    }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up (fixture build, codegen)
      stages.clear(); jobs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"===== $name total=$sec%.3f s jobs=$jobs stages=${stages.size} =====")
      val sorted = stages.sortBy(-_.ms)
      val sumMs = stages.map(_.ms).sum
      println(f"  stage-ms-sum=$sumMs (overlap possible)")
      sorted.take(15).foreach { s =>
        println(f"  [${s.ms}%5d ms] tasks=${s.tasks}%3d in=${s.inputMb}%7.1fMB " +
          f"sr=${s.shufReadMb}%7.2fMB sw=${s.shufWriteMb}%7.2fMB spill=${s.spillMb}%5.1fMB ${s.name}")
      }
    }
    spark.stop()
  }
}
