package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

/** Reference-recompute tests for the round-4 scrub/monitoring operators:
  * `text_pii_redact` (Java-regex redaction recomputed directly on the
  * driver), `text_repetition_stats` (token/shingle fractions recomputed
  * with plain collections), and `etl_anomaly_zscore` (decimal moments
  * recomputed with java.math.BigDecimal). Each is an independent
  * implementation of the same contract, compared row-for-row.
  */
class RedactionAnomalySpec extends SparkSpecBase {

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("text_pii_redact matches a driver-side Java-regex recompute") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
    val expected = docs.map { case (id, text, source) =>
      val txt = text + " contact user" + id + "@" + source + ".org ip 10." +
        (id % 256) + ".0." + (id % 100) + " tel 555-867-" + f"${id % 10000}%04d"
      val redacted = txt
        .replaceAll(emailRe, "<EMAIL>")
        .replaceAll(ipRe, "<IP>")
        .replaceAll(phoneRe, "<PHONE>")
      id -> ((
        emailRe.r.findAllIn(txt).size.toLong,
        ipRe.r.findAllIn(txt).size.toLong,
        phoneRe.r.findAllIn(txt).size.toLong,
        md5hex(redacted)))
    }.toMap
    val got = operators.TextOps.textPiiRedact.fn(spark, sfDir)
      .select($"doc_id", $"n_emails".cast("long"), $"n_ips".cast("long"),
        $"n_phones".cast("long"), $"redacted_md5")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, ne, ni, np, h) =>
      assert(expected(id) == ((ne, ni, np, h)),
        s"doc $id: got ($ne,$ni,$np,$h) expected ${expected(id)}")
      assert(ne >= 1 && ni >= 1 && np >= 1, s"doc $id: injected PII not matched")
    }
  }

  test("text_repetition_stats matches a plain-collections recompute") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def round6(d: Double): JBigDecimal =
      new JBigDecimal(d).setScale(6, RoundingMode.HALF_UP)
    val expected = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val nTok = toks.length.toLong
      val counts = toks.groupBy(identity).view.mapValues(_.length).toMap
      val topFrac = round6(counts.values.max * 1.0 / nTok)
      val sh = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val dupFrac =
        if (sh.isEmpty) new JBigDecimal(0).setScale(6)
        else round6(1.0 - sh.distinct.size * 1.0 / sh.size)
      val flag =
        if (topFrac.doubleValue > 0.12 || dupFrac.doubleValue > 0.05) 1L else 0L
      id -> ((nTok, counts.size.toLong, topFrac, dupFrac, flag))
    }.toMap
    val got = operators.TextOps.textRepetitionStats.fn(spark, sfDir)
      .select($"doc_id", $"n_tok".cast("long"), $"n_distinct_tok".cast("long"),
        $"top_tok_frac".cast("decimal(18,6)"), $"dup_3gram_frac".cast("decimal(18,6)"),
        $"is_repetitive".cast("long"))
      .as[(Long, Long, Long, JBigDecimal, JBigDecimal, Long)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, nt, nd, tf, df, fl) =>
      val (ent, end, etf, edf, efl) = expected(id)
      assert(nt == ent && nd == end && tf.compareTo(etf) == 0 &&
        df.compareTo(edf) == 0 && fl == efl,
        s"doc $id: got ($nt,$nd,$tf,$df,$fl) expected ($ent,$end,$etf,$edf,$efl)")
    }
  }

  test("etl_anomaly_zscore matches a BigDecimal-moment recompute") {
    import spark.implicits._
    val evs = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val expected = evs
      .groupBy(_._2)
      .flatMap { case (tpe, rows) =>
        val n = rows.length
        val sx = rows.map(r => new JBigDecimal(r._3).setScale(10, RoundingMode.HALF_UP))
          .reduce(_.add(_))
        val sxx = rows.map(r => new JBigDecimal(r._3 * r._3).setScale(10, RoundingMode.HALF_UP))
          .reduce(_.add(_))
        val mu = sx.doubleValue / n
        val sigma = math.sqrt((sxx.doubleValue - n * mu * mu) / (n - 1))
        rows.flatMap { case (id, _, v) =>
          val z = new JBigDecimal((v - mu) / sigma).setScale(6, RoundingMode.HALF_UP)
          if (z.abs.doubleValue >= 2.5) Some((id, (tpe, v, z))) else None
        }.toSeq
      }
      .toMap
    val got = operators.EtlOps.etlAnomalyZscore.fn(spark, sfDir)
      .select($"event_id", $"event_type", $"value", $"z".cast("decimal(18,6)"))
      .as[(Long, String, Double, JBigDecimal)].collect()
    assert(got.length == expected.size, s"${got.length} outliers vs ${expected.size}")
    got.foreach { case (id, tpe, v, z) =>
      val (etpe, ev, ez) = expected(id)
      assert(tpe == etpe && v == ev && z.compareTo(ez) == 0,
        s"event $id: got ($tpe,$v,$z) expected ($etpe,$ev,$ez)")
    }
  }
}
