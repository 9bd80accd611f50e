package graft

/** Recursive delete for LOCAL scratch directories (fixture synthesis,
  * probe state, gate working dirs). java.io only, by design: store
  * data itself always moves through the Hadoop FileSystem APIs of the
  * operators that own it. */
object LocalFs {
  def rmrf(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
  }
}
