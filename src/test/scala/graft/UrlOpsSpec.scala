package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toSeq.toDF("url")
      .select(UrlOps.canonOf(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalizer: case, default port, trailing slash, tracking " +
    "params, param order") {
    assert(canon("HTTPS://WWW.Example.COM/Path/A/") ==
      Seq("https://www.example.com/Path/A")) // authority lowercased, path case KEPT
    assert(canon("https://a.example:443/x") == Seq("https://a.example/x"))
    assert(canon("http://a.example:80/x") == Seq("http://a.example/x"))
    assert(canon("https://a.example:8080/x") ==
      Seq("https://a.example:8080/x")) // non-default port kept
    assert(canon("https://a.example/x?utm_source=f&id=1&ref=rss") ==
      Seq("https://a.example/x?id=1"))
    assert(canon("https://a.example/x?b=2&a=1") ==
      Seq("https://a.example/x?a=1&b=2")) // params sorted
    assert(canon("https://a.example/x?utm_campaign=s") ==
      Seq("https://a.example/x")) // all params stripped ⇒ no '?'
    assert(canon("https://a.example/x?fbclid=abc&gclid=1&id=2") ==
      Seq("https://a.example/x?id=2"))
  }

  test("planted alias families collapse: doc_ids congruent mod 100 " +
    "share one canonical URL, local replay agrees") {
    val rows = UrlOps.dedupUrl(spark, sf).collect()
    val docIds = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    // local replay of the planting arithmetic + canonicalizer
    def raw(d: Long): String = {
      val host =
        if (d % 2 == 0) s"https://www.site${d % 20}.example"
        else s"HTTPS://WWW.Site${d % 20}.EXAMPLE"
      val port = if (d % 3 == 0) ":443" else ""
      val slash = if (d % 5 == 0) "/" else ""
      val q = (d % 4) match {
        case 0 => s"?utm_source=feed&id=${d % 50}"
        case 1 => s"?id=${d % 50}&utm_campaign=spring"
        case 2 => s"?id=${d % 50}"
        case _ => s"?ref=rss&id=${d % 50}"
      }
      s"$host$port/p/${d % 50}$slash$q"
    }
    def canonLocal(u: String): String = {
      val m = "^([A-Za-z]+)://([^/?#]+)([^?#]*)\\??(.*)$".r
      val (s0, a0, p0, q0) = u match {
        case m(a, b, c, d) => (a, b, c, d)
        case _ => fail(s"unparseable url $u")
      }
      val s1 = s0.toLowerCase
      val a1 = a0.toLowerCase match {
        case a if s1 == "https" && a.endsWith(":443") => a.dropRight(4)
        case a if s1 == "http" && a.endsWith(":80") => a.dropRight(3)
        case a => a
      }
      val p1 = p0.reverse.dropWhile(_ == '/').reverse
      val ks = q0.split("&").filter(x => x.nonEmpty &&
        !(x.startsWith("utm_") || x.startsWith("ref=") ||
          x.startsWith("fbclid=") || x.startsWith("gclid="))).sorted
      s"$s1://$a1$p1" + (if (ks.nonEmpty) "?" + ks.mkString("&") else "")
    }
    val expect = docIds.groupBy(d => canonLocal(raw(d)))
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val c = r.getAs[String]("canon_url")
      val ds = expect(c)
      assert(r.getAs[Long]("n_docs") == ds.length)
      assert(r.getAs[Long]("keep_doc") == ds.min)
      assert(r.getAs[String]("site") == s"site${ds.min % 20}")
      assert(r.getAs[Long]("n_surfaces") == ds.map(raw).distinct.length)
    }
    // the planting really exercises collapse: every family has > 1 member
    assert(rows.forall(_.getAs[Long]("n_docs") > 1))
  }

  test("url plans: canonicalization is a narrow map (no UDF), dedup is " +
    "one hash aggregate keyed by the canonical string") {
    val plan = UrlOps.dedupUrl(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(!plan.contains("CartesianProduct"))
  }
}
