package graft.tools

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall attribution for the standalone benches: a multi-job
  * operator (sketch build scan, candidate count, AQE sub-stages, the
  * final write) prints one JSON fragment per job, named by the last
  * stage's callsite. Listener events are delivered ASYNC — the final
  * (often largest) job's end event can land after the action returns —
  * so readers must call [[Recorder.drain]] before printing.
  */
object JobBreakdown {

  final class Recorder(sc: SparkContext) {
    private val log = new ConcurrentLinkedQueue[String]()
    private val starts = new ConcurrentHashMap[Int, (Long, String)]()

    sc.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val sec = String.format(java.util.Locale.ROOT, "%.2f",
            Double.box((System.nanoTime() - t0) / 1e9))
          // the site is a free-form stage callsite string — truncate to
          // its first line and JSON-escape it (BenchUtil.jsonEscape) or a
          // site containing `"` corrupts the one-line-JSON bench contract
          val escaped = BenchUtil.jsonEscape(site.takeWhile(_ != '\n'))
          log.add(s"""{"job":${je.jobId},"sec":$sec,"site":"$escaped"}""")
        }
      }
    })

    def clear(): Unit = log.clear()

    /** Wait (bounded) for in-flight job-end events, then hand each JSON
      * fragment to `emit`. */
    def drain(emit: String => Unit, maxWaitMs: Long = 5000L): Unit = {
      val deadline = System.nanoTime() + maxWaitMs * 1000 * 1000
      while (!starts.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      log.forEach(l => emit(l))
    }
  }
}
