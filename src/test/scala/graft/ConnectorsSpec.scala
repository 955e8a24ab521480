package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Connectors
import graft.pipeline.{Apply, Logs}

/** Connector-boundary logic: retry protocol, ranged random access, multipart
  * upload sequencing, apply-side error classification/poll loops, and the
  * remote log collector — all with injected IO.
  */
class ConnectorsSpec extends AnyFunSuite {

  test("retrying: succeeds after transient failures, runs the between hook") {
    var calls = 0
    val relogins = scala.collection.mutable.ListBuffer[Int]()
    val got = Connectors.retrying(attempts = 5,
      between = (i, _) => relogins += i) {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls")
      "payload"
    }
    assert(got == "payload" && calls == 3)
    assert(relogins.toList == List(1, 2)) // hook ran between attempts only
  }

  test("retrying: exhausts attempts and rethrows the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Connectors.retrying(attempts = 5) { calls += 1; sys.error(s"boom $calls") }
    }
    assert(calls == 5 && e.getMessage == "boom 5")
  }

  test("RangeStream: seek semantics and exact ranged reads") {
    val data = (0 until 100).map(_.toByte).toArray
    val fetched = scala.collection.mutable.ListBuffer[(Long, Long)]()
    val s = new Connectors.RangeStream(data.length.toLong, (off, n) => {
      fetched += ((off, n)); data.slice(off.toInt, (off + n).toInt)
    })
    s.seek(-10, whence = 2) // 10 bytes from EOF — the zip-directory move
    assert(s.tell == 90)
    assert(s.read(4).toSeq == Seq(90, 91, 92, 93).map(_.toByte))
    assert(s.tell == 94)
    s.seek(2, whence = 1)
    assert(s.read().toSeq == Seq(96, 97, 98, 99).map(_.toByte)) // rest
    assert(fetched.toList == List((90L, 4L), (96L, 4L)))
  }

  test("RangeStream: a short read is an error, not silent truncation") {
    val s = new Connectors.RangeStream(100L, (_, _) => Array[Byte](1, 2))
    intercept[java.io.IOException] { s.read(10) }
  }

  test("uploadPlan: single-shot below the buffer, chunked sequence above") {
    val m = 10L * 1024 * 1024
    assert(Connectors.uploadPlan(5) == Seq(
      Connectors.UploadPart("create", 0, 0),
      Connectors.UploadPart("single", 0, 5)))
    assert(Connectors.uploadPlan(m) == Seq( // exactly one buffer: single
      Connectors.UploadPart("create", 0, 0),
      Connectors.UploadPart("single", 0, m)))
    assert(Connectors.uploadPlan(2 * m + 7) == Seq(
      Connectors.UploadPart("create", 0, 0),
      Connectors.UploadPart("start", 0, m),
      Connectors.UploadPart("continue", m, m),
      Connectors.UploadPart("finish", 2 * m, 7)))
    // exact multiple: reference would never finish (DIVERGENCES #12);
    // here the last full chunk IS the finish
    assert(Connectors.uploadPlan(2 * m) == Seq(
      Connectors.UploadPart("create", 0, 0),
      Connectors.UploadPart("start", 0, m),
      Connectors.UploadPart("finish", m, m)))
  }

  test("Apply.classify mirrors the reference's error taxonomy") {
    import Apply._
    assert(classify("x\nCannot check for updates: There is/are 2 revision(s) available.") == UpdateAvailable)
    assert(classify("...: OpenERP version doesn't match database version!") == UpdateAvailable)
    assert(classify("Authentification Failed, please contact the support") == AuthRetry)
    assert(classify("ServerUpdate: Server is updating modules ...") == ServerUpdating)
    assert(classify("arbitrary explosion") == Fatal)
  }

  test("awaitRestart polls until the ping answers; bounded when it never does") {
    var pings = 0
    assert(Apply.awaitRestart(() => { pings += 1; pings == 3 },
      maxAttempts = 10, sleep = () => ()))
    assert(pings == 3)
    assert(!Apply.awaitRestart(() => false, maxAttempts = 4, sleep = () => ()))
  }

  test("updateModulesLoop: retries through ServerUpdating, fatals propagate") {
    var n = 0
    val ok = Apply.updateModulesLoop(() => {
      n += 1
      if (n < 4) Left("ServerUpdate: Server is updating modules ...")
      else Right(())
    }, maxAttempts = 10, sleep = () => ())
    assert(ok && n == 4)
    intercept[IllegalStateException] {
      Apply.updateModulesLoop(() => Left("kaboom"), maxAttempts = 3,
        sleep = () => ())
    }
  }

  test("Logs buffers progress lines and posts once to remote?who=host") {
    val posted = scala.collection.mutable.ListBuffer[(String, String)]()
    val logs = new Logs((url, body) => posted += ((url, body)))
    logs.progress("line one")
    logs.progress("line two")
    logs.flush(None) // no --remote: no post (main.py:900)
    assert(posted.isEmpty)
    logs.flush(Some("https://collector.example/logs"), hostname = "h1")
    assert(posted.toList ==
      List(("https://collector.example/logs?who=h1", "line one\nline two")))
  }

  test("delete builds the POST-tunneled DELETE and checks 200/201") {
    val req = Connectors.deleteRequest("https://host/personal/site",
      "/Documents/", "backup.zip")
    assert(req.url ==
      "https://host/personal/site/_api/web/getfilebyserverrelativeurl('/Documents/backup.zip')")
    assert(req.method == "POST")
    assert(req.headers == Map("X-HTTP-Method" -> "DELETE"))

    var hit = 0
    assert(Connectors.delete("https://h", "/p/", "f.zip", r => {
      hit += 1; (201, "")
    }))
    assert(hit == 1)
    val err = intercept[java.io.IOException] {
      Connectors.delete("https://h", "/p/", "f.zip", _ => (404, "not found"))
    }
    assert(err.getMessage.contains("not found"))
  }
}
