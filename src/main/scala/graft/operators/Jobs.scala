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
  case object Cancelled extends Status
  final case class Error(cause: Throwable) extends Status

  final class JobHandle private[Jobs] (val ticket: String, val df: DataFrame,
                                       result: Future[Long]) {
    @volatile private[Jobs] var state: Status = Pending
    @volatile private[Jobs] var cancelRequested = false
    def status: Status = state

    /** The reference's `Job.cancel(true)` (Job.java:71, invoked by
      * Producer on client disconnect and stream teardown,
      * Producer.java:133-136): interrupt the ticket's running Spark jobs
      * via the job group (registered with interruptOnCancel) and pin the
      * terminal CANCELLED state. Returns false if the job already
      * reached a terminal state — cancel loses the race, same contract
      * as Future.cancel. State transitions are synchronized on the
      * handle, so concurrent cancels can't both win and a cancel can't
      * clobber an already-recorded Complete/Error. */
    def cancel(): Boolean = this.synchronized {
      state match {
        case Complete | Cancelled | Error(_) => false
        case _ =>
          cancelRequested = true
          df.sparkSession.sparkContext.cancelJobGroup(ticket)
          state = Cancelled
          true
      }
    }

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
            h.synchronized { if (h.state == Pending) h.state = Producing }
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
      // cancel-before-start: cancelJobGroup only interrupts RUNNING jobs,
      // so a cancel that lands while Pending must keep the plan from ever
      // launching. The check sits AFTER setJobGroup: once the group is
      // registered, a later cancel interrupts mid-count via the group.
      // The residual window — cancel between this check and the first
      // job actually launching inside count() — lets that count run, but
      // the post-count check still reports the cancel verdict; closing
      // it fully would need cooperative per-task checks.
      sc.setJobGroup(ticket, s"graft job $ticket", interruptOnCancel = true)
      try {
        if (handle.cancelRequested)
          throw new java.util.concurrent.CancellationException(ticket)
        val n = df.count()
        // count raced a cancel to completion: honor the cancel verdict
        if (handle.cancelRequested)
          throw new java.util.concurrent.CancellationException(ticket)
        n
      } finally sc.clearJobGroup()
    }
    promise.completeWith(fut)
    fut.onComplete { r =>
      handle.synchronized {
        // a cancel that already pinned Cancelled must not be clobbered;
        // conversely a genuine result recorded here makes a LATER
        // cancel() lose (it sees the terminal state under the same lock)
        handle.state =
          if (handle.cancelRequested) Cancelled
          else r.fold(Error(_), _ => Complete)
      }
      sc.removeSparkListener(listener)
    }
    handle
  }

  /** `CANCEL <ticket>`: cancel a registered job (see
    * [[JobHandle.cancel]]); None for unknown tickets (NOT_FOUND). */
  def cancel(ticket: String): Option[Boolean] =
    Option(registry.get(ticket)).map(_.cancel())

  /** `job.status` (StatusHandler.java:33-50). */
  def status(ticket: String): Option[Status] =
    Option(registry.get(ticket)).map(_.status)

  /** `info.jobs` (ServerInfoHandler.java:48-111). */
  def list(): Map[String, Status] =
    registry.asScala.map { case (t, h) => t -> h.status }.toMap

  /** `info.version` — a JSON object, because the reference's client
    * `json.loads`es the body and requires a dict
    * (neo4j_arrow.py:146-155 `info()`; ServerInfoHandler serializes a
    * map server-side). */
  val version: String =
    """{"serverName":"graft","serverVersion":"0.1.0"}"""
}
