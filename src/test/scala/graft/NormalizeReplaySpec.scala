package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IndelRatio
import graft.normalize.Vocab
import graft.oracle.NormalizeReplay

/** Guards for the corpus-replay oracle (oracle/NormalizeReplay.scala).
  *
  * The replay's one generation-time computation is the fuzzy M-6
  * classification of backfill-created industry names, precomputed with
  * an independent full-matrix LCS. These tests pin (a) that the
  * independent scorer agrees with the production codegen kernel, and
  * (b) the structural assumption that makes the exact-only SQL replay
  * valid: every name that can carry the Industry label at M-6 on this
  * corpus is either an exact vocab member or a backfill name.
  */
class NormalizeReplaySpec extends AnyFunSuite {

  test("independent LCS scorer matches the production indel kernel " +
    "on every (backfill name, vocab term) pair") {
    val names = Vocab.StandardIndustryMap.map(_._2).distinct
    val vocab = Vocab.IndustryTaxonomy.map(_._1) ++
      Vocab.ConceptsNotIndustries ++ Vocab.IndustryGenericToDelete
    for (n <- names; v <- vocab) {
      val a = NormalizeReplay.lcsRatio(n, v)
      val b = IndelRatio.ratio(n, v)
      assert(math.abs(a - b) < 1e-9, s"($n, $v): lcs=$a kernel=$b")
    }
  }

  test("every Industry-capable corpus name is exact-decidable or a backfill name") {
    // Industry rows reaching M-6 come from (a) pool entries labeled
    // Industry — CorpusGen.specialPool: keptCanonical taxonomy
    // variants, OrganizationsNotIndustries, and the 5 fixture names —
    // or (b) backfill (StandardIndustryMap values). Dirt forms are
    // undone by M-1 (plural dirt never applies to special-pool
    // entries), so exact membership below is membership at M-6 time.
    val exact = Vocab.IndustryTaxonomy.map(_._1).toSet ++
      Vocab.ConceptsNotIndustries ++ Vocab.OrganizationsNotIndustries ++
      Vocab.IndustryGenericToDelete
    val fixtureIndustries = Seq("automotive", "artificial intelligence",
      "software development", "iot", "machine learning")
    val poolIndustryNames =
      Vocab.IndustryTaxonomy.map(_._1) ++ Vocab.OrganizationsNotIndustries ++
        fixtureIndustries
    val backfill = Vocab.StandardIndustryMap.map(_._2).distinct
    val nonExact = (poolIndustryNames ++ backfill).filterNot(exact)
    // only the backfill-created names may miss the exact lists, and
    // those are precisely the rows the replay precomputes
    assert(nonExact.toSet.subsetOf(backfill.toSet), s"unexpected: $nonExact")
    // and their precomputed actions are all below every fuzzy
    // threshold on this vocabulary (kept as 'unknown')
    for (n <- nonExact) {
      val taxBest = Vocab.IndustryTaxonomy.map(v => IndelRatio.ratio(n, v._1)).max
      val cBest = Vocab.ConceptsNotIndustries.map(IndelRatio.ratio(n, _)).max
      val gBest = Vocab.IndustryGenericToDelete.map(IndelRatio.ratio(n, _)).max
      assert(taxBest < 80 && cBest < 75 && gBest < 75,
        s"$n: tax=$taxBest concept=$cBest generic=$gBest")
    }
  }
}
