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

  /** Sequential run (the reference runs jobs strictly sequentially,
    * lambda:58-61); `runJob` is the pipeline dispatcher so tests can
    * inject a recorder. Returns jobs in execution order. */
  def run(objectKey: String)(runJob: Job => Unit): Seq[Job] = {
    val jobs = route(objectKey)
    jobs.foreach(runJob)
    jobs
  }

  /** Full reference sequence: jobs, then the catalog-refresh step
    * (lambda:83-97 starts the Glue crawler after the last job; here
    * `crawl` is typically `graft.io.Catalog` registration over the
    * zones the jobs wrote). `crawl` runs only if at least one job ran,
    * matching the lambda's early return for non-matching objects. */
  def runAndCrawl(objectKey: String)(runJob: Job => Unit)(
      crawl: Seq[Job] => Unit): Seq[Job] = {
    val jobs = run(objectKey)(runJob)
    if (jobs.nonEmpty) crawl(jobs)
    jobs
  }
}
