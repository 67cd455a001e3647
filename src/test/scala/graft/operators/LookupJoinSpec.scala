package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{ExecutionContext, Future, Promise}
import java.util.concurrent.ConcurrentHashMap

/** Pure-JVM semantics of the ordered async window (the reference's
  * AsyncDataStream.orderedWait, AsyncDataStream.java:103-169): input order
  * preserved, and a slow future must NOT stall the launching of lookups
  * beyond its window — the ring slides as the head drains. */
class LookupJoinSpec extends AnyFunSuite {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("results come back in input order whatever the completion order") {
    val promises = (0 until 16).map(_ => Promise[Int]())
    val out = LookupJoin.asyncOrderedLookup[Int, Int](
      (0 until 16).iterator, k => promises(k).future, parallelism = 4)
    // complete in scrambled order, from a separate thread as slots launch
    new Thread(() => {
      Thread.sleep(50)
      scala.util.Random.shuffle((0 until 16).toList).foreach { k =>
        promises(k).trySuccess(k * 10)
      }
    }).start()
    assert(out.toList == (0 until 16).map(k => k -> (k * 10)).toList)
  }

  test("a slow head does not block launches past its window (sliding, not batch)") {
    val launched = new ConcurrentHashMap[Int, Long]()
    val slowKey = 1
    val slow = Promise[Int]()
    def lookup(k: Int): Future[Int] = {
      launched.put(k, System.nanoTime())
      if (k == slowKey) slow.future else Future.successful(k)
    }
    val it = LookupJoin.asyncOrderedLookup[Int, Int](
      (0 until 8).iterator, lookup, parallelism = 3)
    // keys 0..2 launch on construction; key 0 is instant → first next()
    // emits it and refills key 3 even though key 1 is still in flight
    assert(it.next() == (0 -> 0))
    assert(launched.containsKey(3), "slot freed by the emitted head must relaunch " +
      "while the slow future is still pending")
    assert(!launched.containsKey(6)) // capacity still bounds the in-flight window
    // with the old batch barrier, nothing beyond the first window of 3 could
    // have launched until the slow key completed
    slow.trySuccess(100)
    assert(it.toList == List(1 -> 100, 2 -> 2, 3 -> 3, 4 -> 4, 5 -> 5, 6 -> 6, 7 -> 7))
  }

  // ---- unorderedWait (AsyncDataStream.java:137-169) -----------------------

  test("unordered: results emit in completion order, slow lookups delay only themselves") {
    val slowKey = 0
    val slow = Promise[Int]()
    def lookup(k: Int): Future[Int] =
      if (k == slowKey) slow.future else Future.successful(k * 10)
    val it = LookupJoin.asyncUnorderedLookup[Int, Int](
      (0 until 8).iterator, lookup, parallelism = 4)
    // the slow HEAD is in flight, yet every fast lookup streams out first —
    // the ordered variant would block on key 0 before emitting anything
    val fastFirst = (1 to 7).map(_ => it.next()).toList
    assert(fastFirst.map(_._1).toSet == (1 to 7).toSet)
    assert(fastFirst.forall { case (k, v) => v == k * 10 })
    slow.trySuccess(999)
    assert(it.next() == (0 -> 999))
    assert(!it.hasNext)
  }

  test("unordered: in-flight window stays bounded and every key is delivered once") {
    val launched = new ConcurrentHashMap[Int, Boolean]()
    val gates = (0 until 12).map(_ => Promise[Int]())
    def lookup(k: Int): Future[Int] = { launched.put(k, true); gates(k).future }
    val it = LookupJoin.asyncUnorderedLookup[Int, Int](
      (0 until 12).iterator, lookup, parallelism = 3)
    assert(launched.size == 3, "only the window launches eagerly")
    // release the middle of the window: its slot refills immediately
    gates(1).trySuccess(1)
    assert(it.next() == (1 -> 1))
    assert(launched.size == 4 && launched.containsKey(3))
    // drain in scrambled order; the full key set arrives exactly once
    new Thread(() => {
      Thread.sleep(20)
      scala.util.Random.shuffle((0 until 12).filter(_ != 1).toList)
        .foreach(k => gates(k).trySuccess(k))
    }).start()
    val rest = it.toList
    assert(rest.map(_._1).sorted == (0 until 12).filter(_ != 1).toList)
    assert(rest.forall { case (k, v) => v == k })
  }
}
