package graft.tools

/** Dev utility: dump the registry (name + oracle presence) so coverage
  * audits don't have to grep for `Q(` call sites.
  */
object ListQueries {
  def main(args: Array[String]): Unit = {
    val qs = graft.Registry.all
    qs.sortBy(_.name).foreach { q =>
      println(s"${q.name}\t${if (q.oracle.isDefined) "oracle" else "NO_ORACLE"}")
    }
    println(s"TOTAL\t${qs.size}")
  }
}
