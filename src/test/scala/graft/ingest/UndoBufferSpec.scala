package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §7.6 semantics; scenario 5 of FIXTURES.md §B. The reference's
  * UndoBuffer is a stub (undo_buffer.go:19-27) — these tests pin the
  * intended behavior. */
class UndoBufferSpec extends AnyFunSuite {

  private def buf(k: Int) = new UndoBuffer[Long](k, identity)

  test("releases blocks beyond the K most recent, in order") {
    val b = buf(3)
    assert(b.addBlock(100).isEmpty)
    assert(b.addBlock(101).isEmpty)
    assert(b.addBlock(102).isEmpty)
    assert(b.addBlock(103) == Seq(100L))
    assert(b.addBlock(104) == Seq(101L))
    assert(b.heldCount == 3)
  }

  test("undo discards held blocks above lastValid; re-emitted canon flows") {
    // emit 100..105, undo→102, re-emit 103'..105' with K=5:
    // output must contain each block exactly once (canonical versions)
    val b = buf(5)
    val out = collection.mutable.ArrayBuffer.empty[Long]
    (100L to 105L).foreach(n => out ++= b.addBlock(n))
    assert(out == Seq(100L)) // 6 added, 5 held
    b.handleUndo(102)
    assert(b.heldCount == 2) // 101, 102
    (103L to 105L).foreach(n => out ++= b.addBlock(n))
    out ++= b.flush()
    assert(out == Seq(100L, 101L, 102L, 103L, 104L, 105L))
  }

  test("undo below the released horizon is unrecoverable") {
    val b = buf(2)
    (100L to 104L).foreach(b.addBlock)
    // 100..102 already released; undo to 100 reaches below held {103,104}
    intercept[IllegalStateException](b.handleUndo(100))
  }

  test("undo at the held boundary is fine") {
    val b = buf(2)
    (100L to 104L).foreach(b.addBlock)  // held: 103,104
    b.handleUndo(102)                   // drops both; horizon respected
    assert(b.heldCount == 0)
    assert(b.addBlock(103).isEmpty)
  }

  test("k=0 passthrough releases immediately (reference default shape)") {
    val b = buf(0)
    assert(b.addBlock(100) == Seq(100L))
    assert(b.heldCount == 0)
  }

  test("flush drains in ascending order") {
    val b = buf(10)
    Seq(105L, 101L, 103L).foreach(b.addBlock)
    assert(b.flush() == Seq(101L, 103L, 105L))
    assert(b.heldCount == 0)
  }
  test("undo below the released horizon throws even when the buffer is empty") {
    val b = buf(2)
    (100L to 104L).foreach(b.addBlock) // 100..102 released
    b.flush()                          // 103, 104 released; buffer empty
    intercept[IllegalStateException](b.handleUndo(103)) // 104 already out
    b.handleUndo(104)                  // exactly at the horizon is a no-op
  }

  test("k=0: horizon guard fires with nothing ever held") {
    val b = buf(0)
    assert(b.addBlock(10) == Seq(10L))
    intercept[IllegalStateException](b.handleUndo(9))
  }

}
