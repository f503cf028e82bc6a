package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.orchestrate.Orchestrator
import graft.orchestrate.Orchestrator._

/** Routing parity with the reference Lambda (lambda:17-53). */
class OrchestratorSpec extends AnyFunSuite {

  test("only .csv keys are accepted (lambda:23)") {
    assert(Orchestrator.accepts("raw/orders/batch1.csv"))
    assert(Orchestrator.accepts("RAW/ORDERS/BATCH1.CSV"))
    assert(!Orchestrator.accepts("raw/orders/batch1.parquet"))
    assert(Orchestrator.route("x.json").isEmpty)
  }

  test("substring routing matches lambda:45-53") {
    assert(Orchestrator.route("raw/orders/o.csv") == Seq(SalesRevenue, DeliveryPerformance))
    assert(Orchestrator.route("raw/products/p.csv") == Seq(SalesRevenue, DeliveryPerformance))
    assert(Orchestrator.route("raw/order-items/i.csv") == Seq(SalesRevenue, DeliveryPerformance))
    assert(Orchestrator.route("raw/feedback/f.csv") == Seq(CustomerFeedback))
    assert(Orchestrator.route("raw/marketing/m.csv") == Seq(MarketingRoi))
    assert(Orchestrator.route("raw/inventory/inventoryNew_1.csv") == Seq(InventoryReconciliation))
    assert(Orchestrator.route("raw/customers/c.csv") == allJobs) // default → all
  }

  test("run executes routed jobs sequentially in order") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[Job]
    val jobs = Orchestrator.run("raw/orders/x.csv")(ran += _)
    assert(jobs == Seq(SalesRevenue, DeliveryPerformance))
    assert(ran.toSeq == jobs)
  }

  test("a failing job is recorded and the remaining jobs still run (lambda:55-81)") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[Job]
    // default route → all five jobs; fail the middle one
    val results = Orchestrator.runRecorded("raw/customers/c.csv") { j =>
      if (j == CustomerFeedback) sys.error("bad feedback csv")
      ran += j
    }
    assert(results.map(_.job) == allJobs)
    assert(ran.toSeq == allJobs.filterNot(_ == CustomerFeedback),
      "jobs after the failure must still execute")
    val byJob = results.map(r => r.job -> r).toMap
    assert(byJob(CustomerFeedback).status == "failed")
    assert(byJob(CustomerFeedback).error.exists(_.contains("bad feedback csv")))
    assert(allJobs.filterNot(_ == CustomerFeedback)
      .forall(byJob(_).succeeded))
    // the run/runAndCrawl convenience forms attempt every routed job too
    val attempted = Orchestrator.run("raw/customers/c.csv") { j =>
      if (j == SalesRevenue) sys.error("boom") }
    assert(attempted == allJobs)
  }

  test("a job exceeding its budget is recorded as timeout; later jobs run (lambda:67)") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[Job]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = Orchestrator.runRecorded("raw/orders/x.csv",
        timeoutSeconds = 1) { j =>
      if (j == SalesRevenue) gate.await() // never released within budget
      else ran += j
    }
    gate.countDown() // unblock the abandoned thread before asserting
    val byJob = results.map(r => r.job -> r).toMap
    assert(byJob(SalesRevenue).status == "timeout")
    assert(byJob(SalesRevenue).error.exists(_.contains("exceeded 1s")))
    assert(byJob(DeliveryPerformance).succeeded)
    assert(ran.toSeq == Seq(DeliveryPerformance))
  }

  test("crawl runs after partial failure with its own outcome (lambda:83-97)") {
    var crawled: Seq[Job] = Nil
    val (results, crawlStatus) =
      Orchestrator.runAndCrawlRecorded("raw/marketing/m.csv") { _ =>
        sys.error("etl failed")
      } { jobs => crawled = jobs }
    assert(results.map(_.status) == Seq("failed"))
    assert(crawlStatus.contains("succeeded"), "crawler still refreshes zones")
    assert(crawled == Seq(MarketingRoi))
    // non-matching key: no jobs, no crawl (lambda's early return)
    val (none, noCrawl) =
      Orchestrator.runAndCrawlRecorded("x.json")(_ => ())(_ => fail("crawled"))
    assert(none.isEmpty && noCrawl.isEmpty)
    // a crawler failure is reported, not thrown
    val (_, failedCrawl) =
      Orchestrator.runAndCrawlRecorded("raw/marketing/m.csv")(_ => ()) {
        _ => sys.error("crawler down") }
    assert(failedCrawl.exists(_.contains("crawler down")))
  }
}
