package graft.functions

import graft.Q
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 / CIDR primitives — the network-analytics scalar family a
  * log pipeline needs before any geo/abuse join: dotted-quad →
  * uint32, CIDR containment (prefix match by integer shift), and
  * private-range (RFC 1918) classification. All integer arithmetic
  * over `split` + casts — codegen map work, no UDF; the same
  * arithmetic replays verbatim in SQL.
  *
  * Runs over a deterministic inline fixture (VALUES oracle — the
  * corpus has no IP column), exercising boundary addresses on both
  * sides of each CIDR edge.
  */
object IpCidr {

  /** uint32 of a dotted-quad string column (as BIGINT). */
  def ipToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    p.getItem(0).cast("long") * 16777216L +
      p.getItem(1).cast("long") * 65536L +
      p.getItem(2).cast("long") * 256L +
      p.getItem(3).cast("long")
  }

  /** Membership of `ip` (uint32) in `base/prefixLen`. */
  def inCidr(ipNum: Column, baseNum: Column, prefixLen: Int): Column =
    shiftrightunsigned(ipNum, 32 - prefixLen) ===
      shiftrightunsigned(baseNum, 32 - prefixLen)

  private val fixture: Seq[(Long, String)] = Seq(
    (1L, "10.0.0.1"), (2L, "10.255.255.255"), (3L, "11.0.0.0"),
    (4L, "172.16.0.1"), (5L, "172.31.255.254"), (6L, "172.32.0.1"),
    (7L, "192.168.1.77"), (8L, "192.169.0.1"), (9L, "8.8.8.8"),
    (10L, "192.168.0.0"))

  private val q = Q(
    "f20_ip_cidr",
    (s, d) => {
      import s.implicits._
      val df = fixture.toDF("id", "ip")
      val n = ipToLong(col("ip"))
      df.select(col("id"), col("ip"), n.as("ip_num"),
        (inCidr(n, lit(167772160L), 8) ||   // 10.0.0.0/8
          inCidr(n, lit(2886729728L), 12) ||  // 172.16.0.0/12
          inCidr(n, lit(3232235520L), 16))    // 192.168.0.0/16
          .as("is_private"),
        inCidr(n, lit(3232235776L), 24).as("in_192_168_1_24"))
    },
    Some {
      val rows = fixture.map { case (i, ip) => s"($i, '$ip')" }
        .mkString(", ")
      s"""WITH fx(id, ip) AS (VALUES $rows),
         |n AS (
         |  SELECT id, ip,
         |    CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
         |    + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
         |    + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
         |    + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num
         |  FROM fx)
         |SELECT id, ip, ip_num,
         |  (ip_num // 16777216 = 167772160 // 16777216
         |   OR ip_num // 1048576 = 2886729728 // 1048576
         |   OR ip_num // 65536 = 3232235520 // 65536) AS is_private,
         |  ip_num // 256 = 3232235776 // 256 AS in_192_168_1_24
         |FROM n""".stripMargin
    },
  )

  def queries: Seq[Q] = Seq(q)
}
