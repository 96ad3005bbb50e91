package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

object DebugTmp {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val stages = mutable.Buffer.empty[(Int, String, Long, Int)]
    val taskMax = mutable.Map.empty[Int, Long]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages += ((i.stageId,
          i.name.take(200) + " | " + i.details.split("\n").take(3).mkString(" ; "),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.numTasks))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val d = if (e.taskInfo != null) e.taskInfo.duration else 0L
        taskMax(e.stageId) = math.max(taskMax.getOrElse(e.stageId, 0L), d)
      }
    })
    val dir = "/tmp/graft-probe-sf1"
    for (i <- 1 to 4) {
      stages.clear(); taskMax.clear()
      val df = graft.operators.Dedup.queries("dedup_edit_distance")(s, dir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"DBG run$i $sec%.2fs")
      val pl = df.queryExecution.executedPlan.toString
      java.nio.file.Files.write(java.nio.file.Paths.get(
        s"/tmp/plan13_run$i" + (if (sec > 15) "_SLOW" else "_fast") + ".txt"),
        pl.getBytes("UTF-8"))
      stages.sortBy(-_._3).take(4).foreach { case (id, n, ms, nt) =>
        println(f"DBG   stage$id ${ms}ms tasks=$nt maxTask=${taskMax.getOrElse(id, -1L)}ms%n        $n")
      }
    }
    s.stop()
  }
}
