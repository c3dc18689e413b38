package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §0.1 tripwire (VERDICT r11 ask #8).
  *
  * Every [PK-*] row in SURVEY §2 was written against the PUBLIC knowledge
  * of stellarsql/StellarSQL because the reference checkout mounted EMPTY
  * (SURVEY §0, verified each judge session). Nothing else in the repo
  * forces a re-anchor if the mount ever gains content — this spec does.
  * It passes exactly while the directory stays empty and fails loudly
  * with the §0.1 instructions the moment it is populated.
  */
class ReferenceMountSpec extends AnyFunSuite {
  test("SURVEY §0.1 tripwire: /root/reference is still an empty mount") {
    val ref = new java.io.File("/root/reference")
    if (!ref.exists()) succeed // unmounted entirely: same contract as empty
    else {
      val entries = Option(ref.list()).map(_.toSeq).getOrElse(Seq.empty)
      assert(
        entries.isEmpty,
        s"""/root/reference is NO LONGER EMPTY (${entries.size} entries: ${entries.take(10).mkString(", ")}).
           |SURVEY §2's [PK-*] rows are unverified against a real checkout.
           |Before trusting them, run the SURVEY §0.1 VERIFY-ON-MOUNT
           |checklist: re-anchor every Origin=R row to real file:lines,
           |prune/add operators accordingly, and update SURVEY §0.""".stripMargin)
    }
  }
}
