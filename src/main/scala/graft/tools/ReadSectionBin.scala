package graft.tools

/** Dev probe: print a child-flushed heavy-pass section
  * (java-serialized [[graft.SectionOut]]) in human-readable form. */
object ReadSectionBin {
  def main(args: Array[String]): Unit = {
    val ois = new java.io.ObjectInputStream(
      java.nio.file.Files.newInputStream(java.nio.file.Paths.get(args(0))))
    val s = try ois.readObject().asInstanceOf[graft.SectionOut] finally ois.close()
    s.records.foreach(r => println(
      s"ROW ${r.name} reps=${r.reps.map(x => f"${x.sec}%.1f").mkString(",")} err=${r.err}"))
    s.oracleTimes.foreach { case (n, t) => println(f"ORACLE $n $t%.1f") }
    s.oracleTimeouts.foreach { case (n, e) => println(s"ORACLE_TIMEOUT $n $e") }
  }
}
