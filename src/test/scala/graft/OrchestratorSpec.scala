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
}
