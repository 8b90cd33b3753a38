package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-level I/O accumulator for [[Bench]] (round-13 VERDICT next #5):
  * sums `inputMetrics.bytesRead` and `shuffleWriteMetrics.bytesWritten`
  * across all tasks between a `reset()` and a read. Wall time swings up
  * to 4× under host CPU-steal; bytes do not — a widened parquet scan or
  * a lost partition-pruning step shows here as a volume diff even when
  * the timing row hides inside window noise.
  *
  * Spark delivers listener events on an async bus with no public drain
  * hook, so [[settle]] polls the event counter until it has been stable
  * for 100 ms (bounded at 3 s) — queries run sequentially in Bench, so
  * a stable counter after an action returns means that query's tasks
  * are fully counted.
  */
class BenchIoListener extends SparkListener {
  val bytesRead = new AtomicLong(0)
  val shuffleWrite = new AtomicLong(0)
  private val events = new AtomicLong(0)

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
    events.incrementAndGet()
    ()
  }

  def reset(): Unit = {
    bytesRead.set(0)
    shuffleWrite.set(0)
  }

  /** Block until no new task-end event has arrived for 100 ms (max 3 s). */
  def settle(): Unit = {
    val deadline = System.nanoTime() + 3_000_000_000L
    var last = events.get()
    Thread.sleep(100)
    while (events.get() != last && System.nanoTime() < deadline) {
      last = events.get()
      Thread.sleep(100)
    }
  }
}
