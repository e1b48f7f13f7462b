package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Behavior pins for d13 (exact-substring span REMOVAL) beyond its
  * oracle: the invariants that must hold for any input, checked on the
  * gate corpus at sf0.001. */
class SubstringRemovalSpec extends SparkSpec {

  private lazy val rows = SparkEntry
    .queries("d13_substring_removal")(spark, "/root/testdata/sf0.001")
    .collect()

  test("injected full copies are fully stripped (both occurrences)") {
    // the corpus injects a re-idified copy of every 5th doc; a full
    // duplicate covers every window of BOTH copies (the aggressive
    // remove-every-occurrence variant — keep-one lives in d7/d8)
    // corpus = N base docs + N/5 injected copies (ids offset past the
    // base id range) → the injected block is the last 1/6 by id
    val copies = rows.sortBy(_.getLong(0)).takeRight(rows.length / 6)
    assert(copies.nonEmpty)
    copies.foreach { r =>
      if (r.getLong(1) >= 20) { // docs long enough to have windows
        assert(r.getLong(2) === 0L, s"copy ${r.getLong(0)} kept tokens")
        assert(r.getString(3) === "", s"copy ${r.getLong(0)} kept text")
      }
    }
  }

  test("short docs (< window) pass through untouched") {
    rows.filter(_.getLong(1) < 20).foreach { r =>
      assert(r.getLong(2) === r.getLong(1),
        s"short doc ${r.getLong(0)} lost tokens")
    }
  }

  test("n_kept equals the clean text's token count") {
    rows.foreach { r =>
      val kept = r.getLong(2)
      val txt = r.getString(3)
      val toks = if (txt.isEmpty) 0L else txt.split(" ").length.toLong
      assert(kept === toks, s"doc ${r.getLong(0)}: n_kept $kept vs $toks")
    }
  }
}
