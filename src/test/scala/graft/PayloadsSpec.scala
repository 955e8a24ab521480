package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions._
import graft.core.Ops
import graft.sources.Payloads

class PayloadsSpec extends SparkSpec {
  import spark.implicits._

  private def zipBytes(members: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    members.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("binaryFile scan + one-member zip validation + checksums") {
    val dir = Files.createTempDirectory("graft_payloads")
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(dir.resolve(name).toFile)
      f.write(bytes); f.close()
    }
    write("good.zip", zipBytes("dump.sql" -> "SELECT 1"))
    write("twomembers.zip", zipBytes("a" -> "x", "b" -> "y"))
    write("ignored.txt", "not a zip".getBytes("UTF-8"))

    val scanned = Payloads.scan(spark, dir.toString)
    assert(scanned.count() == 2) // glob keeps only zips

    val valid = Payloads.validZips(scanned)
      .as[(String, String)].collect().toMap
    assert(valid.size == 1)
    assert(valid.keys.head.endsWith("good.zip"))
    assert(valid.values.head == "dump.sql")

    val sums = Payloads.checksums(scanned)
    assert(sums.filter(col("checksum").isNull).count() == 0)
  }

  test("cleanLines drops blanks and NOTICE lines") {
    val df = Seq("ok line", "", "   ", "NOTICE: blah", "another").toDF("line")
    assert(Ops.cleanLines(df, "line").as[String].collect().toSeq ==
      Seq("ok line", "another"))
  }

  test("decileBucket steps by 10") {
    val df = Seq(0.0, 0.05, 0.11, 0.55, 0.99, 1.0).toDF("f")
    assert(df.select(Payloads.decileBucket(col("f")).as("b"))
      .as[Int].collect().toSeq == Seq(0, 0, 10, 50, 90, 100))
  }
}
