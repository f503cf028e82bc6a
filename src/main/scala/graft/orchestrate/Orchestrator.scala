package graft.orchestrate

/** In-process replacement for the reference's event-driven
  * orchestration (S3 ObjectCreated → Lambda → sequential Glue jobs →
  * crawler refresh; `lambda/blinkit-etl-orchestrator.py`).
  *
  * Routing reproduces the filename-substring rules at lambda:45-53
  * exactly: order/product → sales + delivery; feedback → feedback;
  * marketing → roi; inventory → reconciliation; anything else → all
  * jobs. Only `.csv` objects trigger anything (lambda:23).
  *
  * Instead of start_job_run + 20 s polling (lambda:55-81), pipelines
  * run as function calls inside one SparkSession — the process/cluster
  * boundary collapses into Spark's own driver/executor split, and the
  * "crawler refresh" becomes temp-view (re)registration, which is
  * metadata-only.
  */
object Orchestrator {

  sealed trait Job
  case object SalesRevenue extends Job
  case object DeliveryPerformance extends Job
  case object CustomerFeedback extends Job
  case object MarketingRoi extends Job
  case object InventoryReconciliation extends Job

  val allJobs: Seq[Job] = Seq(
    SalesRevenue, DeliveryPerformance, CustomerFeedback,
    MarketingRoi, InventoryReconciliation)

  /** lambda:17-26 — only .csv object events are processed. */
  def accepts(objectKey: String): Boolean =
    objectKey.toLowerCase.endsWith(".csv")

  /** lambda:45-53 — filename-substring routing (first-match semantics
    * of the reference's if/elif chain, with the order|product branch
    * fanning out to both sales jobs). */
  def route(objectKey: String): Seq[Job] = {
    val key = objectKey.toLowerCase
    if (!accepts(objectKey)) Seq.empty
    else if (key.contains("order") || key.contains("product"))
      Seq(SalesRevenue, DeliveryPerformance)
    else if (key.contains("feedback")) Seq(CustomerFeedback)
    else if (key.contains("marketing")) Seq(MarketingRoi)
    else if (key.contains("inventory")) Seq(InventoryReconciliation)
    else allJobs
  }

  /** Reference per-job time budgets (lambda:67 — 600 s max_wait per
    * Glue job poll; lambda:90 — 300 s crawler wait). */
  val jobTimeoutSeconds: Long = 600
  val crawlTimeoutSeconds: Long = 300

  /** Outcome of one job inside a run — mirrors the reference's
    * per-job `results[job_key]` record (lambda:55-81): the lambda
    * wraps EACH start_job_run/poll in its own try/except, records
    * succeeded / failed / timeout, and CONTINUES to the next job, so
    * one bad input file never takes down the unrelated pipelines. */
  final case class JobResult(job: Job, status: String,
      error: Option[String]) {
    def succeeded: Boolean = status == "succeeded"
  }

  /** Record-and-continue sequential run — the reference's isolation
    * semantics: each job runs under its own try/except AND the 600 s
    * budget (lambda:67); a failure or timeout is recorded and the NEXT
    * job still runs. Timeout parity note: the lambda stops *polling* a
    * Glue job at 600 s and moves on — the remote job may still be
    * running. The in-process equivalent is the same contract: the job
    * thread is abandoned (never killed — interrupting a mid-shuffle
    * Spark action would poison the shared session) and the result map
    * records `timeout`. Jobs run strictly sequentially (lambda:58-61),
    * so at most one abandoned thread per timeout, and `runJob` must be
    * idempotent on re-run like the reference's jobs. */
  def runRecorded(objectKey: String,
      timeoutSeconds: Long = jobTimeoutSeconds)(
      runJob: Job => Unit): Seq[JobResult] =
    route(objectKey).map { job =>
      withBudget(timeoutSeconds, s"job $job")(runJob(job)) match {
        case None => JobResult(job, "succeeded", None)
        case Some(err) if err.startsWith("timeout") =>
          JobResult(job, "timeout", Some(err))
        case Some(err) => JobResult(job, "failed", Some(err))
      }
    }

  /** Sequential run; failures/timeouts are recorded-and-skipped per
    * job ([[runRecorded]] has the statuses). Returns jobs in execution
    * order — every routed job is ATTEMPTED, matching the reference
    * loop, not the first-failure prefix. */
  def run(objectKey: String)(runJob: Job => Unit): Seq[Job] =
    runRecorded(objectKey)(runJob).map(_.job)

  /** Full reference sequence: jobs, then the catalog-refresh step
    * (lambda:83-97 starts the Glue crawler after the last job; here
    * `crawl` is typically `graft.io.Catalog` registration over the
    * zones the jobs wrote). `crawl` runs only if at least one job ran,
    * matching the lambda's early return for non-matching objects —
    * and it runs even when some jobs failed, because the lambda
    * reaches the crawler block unconditionally after the loop, and a
    * partial refresh of the successful zones is the useful outcome.
    * The crawl gets its own 300 s budget (lambda:90). */
  def runAndCrawl(objectKey: String)(runJob: Job => Unit)(
      crawl: Seq[Job] => Unit): Seq[Job] =
    runAndCrawlRecorded(objectKey)(runJob)(crawl)._1.map(_.job)

  /** [[runAndCrawl]] with the per-job and crawl outcomes exposed. */
  def runAndCrawlRecorded(objectKey: String)(runJob: Job => Unit)(
      crawl: Seq[Job] => Unit): (Seq[JobResult], Option[String]) = {
    val results = runRecorded(objectKey)(runJob)
    val crawlStatus =
      if (results.isEmpty) None
      else Some(withBudget(crawlTimeoutSeconds, "crawler")(
        crawl(results.map(_.job))).fold("succeeded")(identity))
    (results, crawlStatus)
  }

  /** Run `body` on a dedicated thread with a wall-clock budget.
    * Returns None on success, Some(message) on failure or timeout.
    * The thread is a daemon and is NOT interrupted on timeout (see
    * [[runRecorded]] — abandoning the poll is the reference's
    * semantics, and a killed Spark action would corrupt shared
    * session state far worse than a stray thread). */
  private def withBudget(timeoutSeconds: Long, what: String)(
      body: => Unit): Option[String] = {
    val outcome = new java.util.concurrent.atomic.AtomicReference[Option[String]](null)
    val t = new Thread(() =>
      outcome.set(
        try { body; None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
        }), s"graft-orchestrator-$what")
    t.setDaemon(true)
    t.start()
    t.join(timeoutSeconds * 1000L)
    Option(outcome.get()) match {
      case Some(result) => result
      case None => Some(s"timeout: $what exceeded ${timeoutSeconds}s budget")
    }
  }
}
