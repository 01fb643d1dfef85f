package graft.operators

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.concurrent.{ExecutionContext, Future}
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame

/** Job control surface (SURVEY.md §2.6 C1-C3): ticketing, status polling
  * and job listing. The reference wraps every stream in an async state
  * machine INITIALIZING → PENDING → PRODUCING → COMPLETE | ERROR
  * (src/.../job/Job.java:21-44); Spark's laziness replaces the
  * PENDING→PRODUCING handshake, so the states map to: handle created
  * (PENDING), first Spark job for the ticket's group started (PRODUCING,
  * via SparkListener), action finished (COMPLETE) or threw (ERROR). */
object Jobs {

  sealed trait Status
  case object Pending extends Status
  case object Producing extends Status
  case object Complete extends Status
  final case class Error(cause: Throwable) extends Status

  final class JobHandle private[Jobs] (val ticket: String, val df: DataFrame,
                                       result: Future[Long]) {
    @volatile private[Jobs] var state: Status = Pending
    def status: Status = state
    def await(): Long = {
      import scala.concurrent.duration._
      scala.concurrent.Await.result(result, 30.minutes)
    }
  }

  private val registry = new ConcurrentHashMap[String, JobHandle]()

  /** Submit a DataFrame as a counted read job (the driver-side analog of
    * `do_get`: run the plan, observe completion). The ticket is a UUID —
    * same contract as Producer.ticketJob (Producer.java:373-405). */
  def submit(df: DataFrame)(implicit ec: ExecutionContext): JobHandle = {
    val ticket = UUID.randomUUID().toString
    val sc = df.sparkSession.sparkContext
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        if (Option(jobStart.properties)
          .exists(_.getProperty("spark.jobGroup.id") == ticket)) {
          Option(registry.get(ticket)).foreach { h =>
            if (h.state == Pending) h.state = Producing
          }
        }
      }
    }
    sc.addSparkListener(listener)
    // register the handle BEFORE the Future can start: onJobStart fires on
    // the listener bus as soon as the job launches, and a fast job would
    // otherwise find registry.get(ticket) == null and permanently lose the
    // Pending → Producing transition
    val promise = scala.concurrent.Promise[Long]()
    val handle = new JobHandle(ticket, df, promise.future)
    registry.put(ticket, handle)
    val fut = Future {
      sc.setJobGroup(ticket, s"graft job $ticket", interruptOnCancel = true)
      try df.count()
      finally sc.clearJobGroup()
    }
    promise.completeWith(fut)
    fut.onComplete { r =>
      handle.state = r.fold(Error(_), _ => Complete)
      sc.removeSparkListener(listener)
    }
    handle
  }

  /** `job.status` (StatusHandler.java:33-50). */
  def status(ticket: String): Option[Status] =
    Option(registry.get(ticket)).map(_.status)

  /** `info.jobs` (ServerInfoHandler.java:48-111). */
  def list(): Map[String, Status] =
    registry.asScala.map { case (t, h) => t -> h.status }.toMap

  /** `info.version`. */
  val version: String = "graft 0.1.0"
}
