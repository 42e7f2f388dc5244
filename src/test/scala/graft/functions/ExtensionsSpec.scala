package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The kernel expressions must be reachable from plain SQL via
  * SparkSessionExtensions (spark.sql.extensions=GraftExtensions). */
class ExtensionsSpec extends AnyFunSuite {

  test("kernel functions are callable from spark.sql") {
    // register into the shared test session (creating a second
    // SparkContext/stopping it would break sibling suites); the
    // builder path (`withExtensions(new GraftExtensions)`) injects the
    // identical function list
    val spark = graft.SparkSpec.spark
    GraftExtensions.register(spark)
    locally {
      val row = spark.sql(
        """SELECT
          |  long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
          |  size(shingle_set('a b c d')) AS n_shingles,
          |  size(char_shingles('abcdefgh')) AS n_cgrams,
          |  simhash16(array('alpha', 'beta')) AS sh,
          |  lsh_bucket(array(5L, -3L, 9L)) AS bucket,
          |  min_md5(array('x', 'y'), 's1:') AS mh,
          |  rolling_hash('a b') AS rh""".stripMargin).head()
      assert(row.getAs[Long]("dot") == 4 + 10 + 18)
      assert(row.getAs[Int]("n_shingles") == 2) // "a b c", "b c d"
      assert(row.getAs[Int]("n_cgrams") == 4)
      assert(row.getAs[Long]("sh") ==
        TextHashKernels.simhash16(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("alpha"),
              org.apache.spark.unsafe.types.UTF8String.fromString("beta")))))
      assert(row.getAs[Long]("bucket") >= 0L && row.getAs[Long]("bucket") < 256L)
      assert(row.getAs[String]("mh").length == 32)
      // fold of "a b": ((0*31+'a')%M *31 + ' ')%M *31 + 'b') % M
      val m = 2147483647L
      val expected = ((('a'.toLong * 31 + ' ') % m) * 31 + 'b') % m
      assert(row.getAs[Long]("rh") == expected)
    }
    locally {
      // round-5 kernels through the same SQL surface
      val row = spark.sql(
        """SELECT
          |  norm_text('  A  b ') AS nt,
          |  ws_token_count('a b c') AS wc,
          |  bag_norm('b a c') AS bn,
          |  bpe_count('ab 12 !') AS bc,
          |  repetition_stats('a a b')[1] AS top_tok,
          |  intersect_count(array('x','y'), array('y','z')) AS ic,
          |  token_ngrams('a b c', 2) AS ng,
          |  size(char_shingle_sketch('abcdefgh', 4)) AS css,
          |  size(token_shingle_md5(array('a','b','c'), 2)) AS tsm,
          |  token_stats('the cat', 'the')[3] AS n_stop""".stripMargin).head()
      assert(row.getAs[String]("nt") == "a b")
      assert(row.getAs[Long]("wc") == 3L)
      assert(row.getAs[String]("bn") == "a b c")
      assert(row.getAs[Long]("bc") == 3L)
      assert(row.getAs[Long]("top_tok") == 2L)
      assert(row.getAs[Long]("ic") == 1L)
      assert(row.getSeq[String](row.fieldIndex("ng")).toList ==
        List("a b", "b c"))
      assert(row.getAs[Int]("css") == 5)
      assert(row.getAs[Int]("tsm") == 2)
      assert(row.getAs[Long]("n_stop") == 1L)
      val row2 = spark.sql(
        """SELECT token_arr(' A b ') AS ta,
          |  min_hex_windows(array('aaaabbbb', 'bbbbaaaa'), 4, 2) AS mw"""
          .stripMargin).head()
      assert(row2.getSeq[String](0).toList == List("a", "b"))
      assert(row2.getSeq[String](1).toList == List("aaaa", "aaaa"))
    }
  }
}
