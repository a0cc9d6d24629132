package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force truth: every (a < b) pair with levenshtein ≤ 1. */
  private def brute(df: DataFrame): Set[(Long, Long, Long)] =
    df.as("x").crossJoin(df.as("y"))
      .where(col("x.id") < col("y.id") &&
        levenshtein(col("x.name"), col("y.name")) <= 1)
      .select(col("x.id"), col("y.id"),
        levenshtein(col("x.name"), col("y.name")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  private def found(df: DataFrame): Set[(Long, Long, Long)] =
    FuzzyJoin.editDist1SelfJoin(df, "id", "name")
      .select($"id_a", $"id_b", $"dist")
      .as[(Long, Long, Long)].collect().toSet

  test("self-join equals brute force on a mixed fixture (all edit classes)") {
    val df = Seq(
      1L -> "spark", 2L -> "spork",   // substitution
      3L -> "sparks",                 // insertion vs 1
      4L -> "park",                   // deletion vs 1
      5L -> "spark",                  // identical vs 1 (dist 0)
      6L -> "ab", 7L -> "ba",         // transposition = dist 2: NOT a pair
      8L -> "", 9L -> "a",            // empty vs single char (dist 1)
      10L -> "",                      // empty vs empty (dist 0)
      11L -> "completely different"
    ).toDF("id", "name")
    val f = found(df)
    assert(f == brute(df))
    assert(f.contains((1L, 2L, 1L)) && f.contains((1L, 3L, 1L)) &&
      f.contains((1L, 4L, 1L)) && f.contains((1L, 5L, 0L)))
    assert(!f.exists(p => Set(p._1, p._2) == Set(6L, 7L)),
      "transpositions are distance 2 and must not pair")
    assert(f.contains((8L, 9L, 1L)) && f.contains((8L, 10L, 0L)))
    assert(!f.exists(p => p._1 == 11L || p._2 == 11L))
    graft.CacheScope.releaseAll()
  }

  test("self-join equals brute force on a 300-string generated corpus") {
    // deterministic generator with planted near-dups: base words plus
    // id-dependent single-char mutations
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val rows = (0L until 300L).map { i =>
      val w = words((i % 5).toInt)
      val mutated = (i % 4) match {
        case 0 => w
        case 1 => w.updated((i % w.length).toInt, 'z') // substitution
        case 2 => w + "x"                              // insertion
        case _ => w.drop(1)                            // deletion
      }
      (i, mutated)
    }
    val df = rows.toDF("id", "name")
    assert(found(df) == brute(df))
    graft.CacheScope.releaseAll()
  }

  test("null names are excluded, not errors") {
    val df = Seq((1L, "ab"), (2L, null: String), (3L, "ac")).toDF("id", "name")
    val f = found(df)
    assert(f == Set((1L, 3L, 1L)))
    graft.CacheScope.releaseAll()
  }

  test("cross-catalog variant links two tables with no self-pairing") {
    val left = Seq((1L, "kitten"), (2L, "apple")).toDF("id", "name")
    val right = Seq((10L, "mitten"), (11L, "appl"), (12L, "banana"))
      .toDF("rid", "rname")
    val f = FuzzyJoin.editDist1Join(left, "id", "name", right, "rid", "rname")
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(f == Set((1L, 10L, 1L), (2L, 11L, 1L)))
    graft.CacheScope.releaseAll()
  }

  test("hot-key cap drops degenerate buckets but keeps isolated pairs") {
    // 20 copies of "hub" make every hub key exceed cap=10; the isolated
    // pair survives through its own (un-hot) keys
    val df = ((0L until 20L).map(i => (i, "hub")) ++
      Seq(100L -> "rare", 101L -> "rare")).toDF("id", "name")
    val f = FuzzyJoin.editDist1SelfJoin(df, "id", "name", maxBucket = 10L)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(f == Set((100L, 101L, 0L)),
      s"capped hub pairs must vanish, rare pair must survive: $f")
    graft.CacheScope.releaseAll()
  }
}
