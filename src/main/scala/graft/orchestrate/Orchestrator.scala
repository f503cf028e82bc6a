package graft.orchestrate

/** In-process replacement for the reference's event-driven
  * orchestration (S3 ObjectCreated → Lambda → sequential Glue jobs →
  * crawler refresh; `lambda/blinkit-etl-orchestrator.py`).
  *
  * Routing reproduces `determine_jobs_to_run` (lambda:44-53) exactly:
  * the match runs against the BASENAME only (`file_key.split('/')[-1]`
  * lowercased — so `raw/orders/batch1.csv` matches nothing and falls
  * through to the all-jobs default), the four branches are INDEPENDENT
  * accumulating `if`s (not a first-match chain — `order_feedback.csv`
  * runs sales + delivery + feedback), the result is set-deduped, and
  * an empty match defaults to every configured job. Only `.csv`
  * objects trigger anything (lambda:23). One deliberate refinement:
  * the reference's `list(set(jobs))` leaves job ORDER unspecified
  * (CPython hash order); we dedup preserving first-mention order so
  * runs are reproducible — the job SET is identical.
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

  /** lambda:44-53 — basename-substring routing with ACCUMULATING
    * branches: every matching `if` contributes its jobs (a file named
    * `order_feedback.csv` routes to sales + delivery + feedback), the
    * list is deduped (`list(set(jobs))` in the reference; here
    * `.distinct` preserving first-mention order — duplicates cannot in
    * fact arise because each branch fires at most once, the dedup is a
    * faithful guard), and no match at all → ALL jobs. The match key is
    * the basename only: `file_key.split('/')[-1].lower()`, so path
    * components like `raw/orders/` never influence routing. */
  def route(objectKey: String): Seq[Job] = {
    if (!accepts(objectKey)) Seq.empty
    else {
      val name = objectKey.split('/').last.toLowerCase
      val jobs = Seq.newBuilder[Job]
      if (name.contains("order") || name.contains("product"))
        jobs ++= Seq(SalesRevenue, DeliveryPerformance)
      if (name.contains("feedback")) jobs += CustomerFeedback
      if (name.contains("marketing")) jobs += MarketingRoi
      if (name.contains("inventory")) jobs += InventoryReconciliation
      val matched = jobs.result().distinct
      if (matched.isEmpty) allJobs else matched
    }
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
    route(objectKey).map(job =>
      toResult(job, withBudget(timeoutSeconds, s"job $job")(runJob(job))))

  /** One outcome classification for both runners. */
  private def toResult(job: Job, outcome: Option[String]): JobResult =
    outcome match {
      case None => JobResult(job, "succeeded", None)
      case Some(err) if err.startsWith("timeout") =>
        JobResult(job, "timeout", Some(err))
      case Some(err) => JobResult(job, "failed", Some(err))
    }

  /** One crawl-gating rule for both runners: crawl once, iff any job
    * succeeded, under the crawler's own budget. */
  private def crawlAfter(results: Seq[JobResult])(
      crawl: Seq[Job] => Unit): (Seq[JobResult], Option[String]) = {
    val succeeded = results.filter(_.succeeded).map(_.job)
    val crawlStatus =
      if (succeeded.isEmpty) None
      else Some(withBudget(crawlTimeoutSeconds, "crawler")(
        crawl(succeeded)).fold("succeeded")(identity))
    (results, crawlStatus)
  }

  /** [[runRecorded]] with the routed jobs running as CONCURRENT Spark
    * jobs — a documented semantics-preserving deviation from the
    * reference's sequential loop (lambda:58-61; SURVEY §4.3): the five
    * jobs are independent by construction (each reads only the raw
    * zone and writes its OWN processed/curated prefix, exactly like
    * the Glue jobs), so a multi-tenant scheduler can overlap them.
    * Spark's scheduler interleaves the concurrent actions across the
    * executor pool — on a cluster this is five Glue jobs running in
    * parallel, which is how the reference's jobs would actually be
    * launched by five simultaneous S3 events. Everything OBSERVABLE is
    * preserved: per-job wall-clock budget (each [[withBudget]] thread
    * starts at fan-out), per-job failure isolation, and results in
    * ROUTING order. [[runRecorded]] stays the faithful sequential
    * replica for routing-parity tests. */
  def runRecordedConcurrent(objectKey: String,
      timeoutSeconds: Long = jobTimeoutSeconds)(
      runJob: Job => Unit): Seq[JobResult] = {
    val jobs = route(objectKey)
    val results = new Array[JobResult](jobs.length)
    val threads = jobs.zipWithIndex.map { case (job, i) =>
      val t = new Thread(() => {
        results(i) =
          toResult(job, withBudget(timeoutSeconds, s"job $job")(runJob(job)))
      }, s"graft-orchestrator-fanout-$job")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    results.toSeq
  }

  /** [[runAndCrawlRecorded]] over the concurrent fan-out: jobs overlap,
    * the crawl still runs once afterwards iff any job succeeded. */
  def runAndCrawlRecordedConcurrent(objectKey: String)(runJob: Job => Unit)(
      crawl: Seq[Job] => Unit): (Seq[JobResult], Option[String]) =
    crawlAfter(runRecordedConcurrent(objectKey)(runJob))(crawl)

  /** Sequential run; failures/timeouts are recorded-and-skipped per
    * job ([[runRecorded]] has the statuses). Returns jobs in execution
    * order — every routed job is ATTEMPTED, matching the reference
    * loop, not the first-failure prefix. */
  def run(objectKey: String)(runJob: Job => Unit): Seq[Job] =
    runRecorded(objectKey)(runJob).map(_.job)

  /** Full reference sequence: jobs, then the catalog-refresh step
    * (here `crawl` is typically `graft.io.Catalog` registration over
    * the zones the jobs wrote). The lambda starts the crawler ONLY
    * when at least one job succeeded (`if len(successful) > 0`,
    * lambda:31-33) — an all-failed run leaves the catalog untouched,
    * because there is no fresh zone to refresh. The crawl gets its own
    * 300 s budget and records (never throws) its outcome
    * (`start_and_wait_crawler`, lambda:84-97). `crawl` receives only
    * the SUCCEEDED jobs — those are the zones that actually changed. */
  def runAndCrawl(objectKey: String)(runJob: Job => Unit)(
      crawl: Seq[Job] => Unit): Seq[Job] =
    runAndCrawlRecorded(objectKey)(runJob)(crawl)._1.map(_.job)

  /** [[runAndCrawl]] with the per-job and crawl outcomes exposed. */
  def runAndCrawlRecorded(objectKey: String)(runJob: Job => Unit)(
      crawl: Seq[Job] => Unit): (Seq[JobResult], Option[String]) =
    crawlAfter(runRecorded(objectKey)(runJob))(crawl)

  /** One S3 ObjectCreated record inside an event envelope
    * (`event['Records'][i]['s3']`, lambda:20-22). */
  final case class S3Record(bucket: String, objectKey: String)

  /** Outcome of one event envelope, mirroring the lambda's HTTP-shaped
    * return: 200 all-success or no-CSV, 207 partial failure
    * (lambda:34). `processed` is the one record that ran (None when
    * every record was skipped). */
  final case class EventOutcome(statusCode: Int, processed: Option[S3Record],
      results: Seq[JobResult], crawlStatus: Option[String])

  /** Multi-record event entry point, mirroring `lambda_handler`
    * (lambda:17-38) exactly — including its sharpest edge: the
    * `return` statement sits INSIDE the record loop, so the lambda
    * processes AT MOST ONE CSV record per event. Records are scanned
    * in order; non-`.csv` keys are skipped (lambda:23-25); the first
    * record that routes to a non-empty job list runs its jobs, crawls
    * if any succeeded, and ends the event (lambda:26-34). Later
    * records in the same envelope are silently dropped — that is the
    * reference's behavior, preserved here because a replayer of real
    * S3 notification batches must see identical processing decisions.
    * An envelope with no runnable CSV returns 200/"No CSV files"
    * (lambda:35). */
  def handleEvent(records: Seq[S3Record])(runJob: Job => Unit)(
      crawl: Seq[Job] => Unit): EventOutcome = {
    records.iterator
      .filter(r => accepts(r.objectKey) && route(r.objectKey).nonEmpty)
      .nextOption() match {
      case Some(rec) =>
        val (results, crawlStatus) =
          runAndCrawlRecorded(rec.objectKey)(runJob)(crawl)
        val code = if (results.forall(_.succeeded)) 200 else 207
        EventOutcome(code, Some(rec), results, crawlStatus)
      case None => EventOutcome(200, None, Nil, None)
    }
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
