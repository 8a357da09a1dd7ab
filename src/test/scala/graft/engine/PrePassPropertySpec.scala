package graft.engine

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for the reference-dialect WHERE semantics (VERDICT r16
  * #7): seeded ScalaCheck generation over WHERE trees — all 7 reference
  * comparators including the dialect's `==`, nested AND/OR both with
  * explicit parens and as flat precedence chains, col-vs-col and
  * col-vs-literal with negative literals, qualified and unqualified
  * references — asserting row parity between the Engine path
  * (prePass → spark.sql over the CSV catalog) and a direct in-memory
  * evaluator over the same fixture rows. The golden EngineSpec cases
  * pin known corners; this pins the SEMANTICS against parser or
  * pre-pass drift across the whole expression family.
  */
class PrePassPropertySpec extends SparkTestBase {

  private val refDir = "/root/reference"
  private def withRef(): Unit =
    assume(new java.io.File(s"$refDir/metadata.txt").exists(),
      "reference fixtures not present")

  private lazy val run: String => org.apache.spark.sql.DataFrame = {
    withRef()
    Engine.forDirectory(spark, refDir)
  }

  /** table1 rows parsed directly from the CSV — the independent ground
    * truth the Spark path is compared against (quoted ints appear in
    * the reference fixtures; strip them like CsvCatalogSource does).
    */
  private lazy val rows: Seq[Map[String, Long]] = {
    val src = scala.io.Source.fromFile(s"$refDir/table1.csv")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val vs = line.split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"").toLong)
      Map("A" -> vs(0), "B" -> vs(1), "C" -> vs(2))
    }.toList
    finally src.close()
  }

  // ---- WHERE-tree generator -----------------------------------------

  private sealed trait Tree {
    def sql: String
    def eval(r: Map[String, Long]): Boolean
  }
  private case class Leaf(lhs: Either[String, Long],
      op: String, rhs: Either[String, Long]) extends Tree {
    private def render(s: Either[String, Long]): String = s match {
      case Left(c) => c
      case Right(v) => v.toString
    }
    def sql: String = s"${render(lhs)} $op ${render(rhs)}"
    private def value(s: Either[String, Long],
        r: Map[String, Long]): Long = s match {
      case Left(c) => r(c.stripPrefix("table1."))
      case Right(v) => v
    }
    def eval(r: Map[String, Long]): Boolean = {
      val (a, b) = (value(lhs, r), value(rhs, r))
      op match {
        case "=" | "==" => a == b
        case "!=" => a != b
        case "<" => a < b
        case "<=" => a <= b
        case ">" => a > b
        case ">=" => a >= b
      }
    }
  }
  private case class And(l: Tree, r: Tree) extends Tree {
    def sql = s"(${l.sql} AND ${r.sql})"
    def eval(m: Map[String, Long]) = l.eval(m) && r.eval(m)
  }
  private case class Or(l: Tree, r: Tree) extends Tree {
    def sql = s"(${l.sql} OR ${r.sql})"
    def eval(m: Map[String, Long]) = l.eval(m) || r.eval(m)
  }

  private val ops = Seq("=", "==", "!=", "<", "<=", ">", ">=")

  private lazy val litGen: Gen[Long] = {
    // mix arbitrary (often-negative) literals with values that occur in
    // the data, so equality leaves are not vacuously empty
    val present = rows.flatMap(_.values).distinct
    Gen.frequency(
      2 -> Gen.chooseNum(-1200L, 1200L),
      1 -> Gen.oneOf(present))
  }

  private val colGen: Gen[String] = for {
    c <- Gen.oneOf("A", "B", "C")
    qualified <- Gen.oneOf(true, false)
  } yield if (qualified) s"table1.$c" else c

  private lazy val leafGen: Gen[Tree] = for {
    op <- Gen.oneOf(ops)
    lhs <- Gen.frequency(
      3 -> colGen.map(Left(_): Either[String, Long]),
      1 -> litGen.map(Right(_): Either[String, Long]))
    rhs <-
      if (lhs.isLeft) Gen.frequency(
        2 -> litGen.map(Right(_): Either[String, Long]),
        1 -> colGen.map(Left(_): Either[String, Long]))
      else colGen.map(Left(_): Either[String, Long])
  } yield Leaf(lhs, op, rhs)

  private def treeGen(depth: Int): Gen[Tree] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      1 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) }
        yield And(l, r)),
      1 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) }
        yield Or(l, r)))

  /** Deterministic sample stream: seeds 1..∞ through the generator. */
  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(1)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private def check(sql: String, want: Seq[Map[String, Long]]): Unit = {
    val got = run(s"SELECT * FROM table1 WHERE $sql").collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue))
      .sorted.toSeq
    val exp = want.map(m => (m("A"), m("B"), m("C"))).sorted
    assert(got == exp, s"WHERE $sql")
  }

  test("160 seeded parenthesized WHERE trees: Engine rows equal the " +
    "direct evaluator on the CSV fixture") {
    withRef()
    for (t <- cases(treeGen(3), 160))
      check(t.sql, rows.filter(t.eval))
  }

  test("40 seeded FLAT precedence chains (no parens): AND binds " +
    "tighter than OR through the pre-pass and parser") {
    withRef()
    val chainGen: Gen[(String, Map[String, Long] => Boolean)] = for {
      leaves <- Gen.listOfN(4, leafGen)
      conns <- Gen.listOfN(3, Gen.oneOf("AND", "OR"))
    } yield {
      val sql = leaves.map(_.sql).zipAll(conns.map(" " + _ + " "), "", "")
        .map { case (l, c) => l + c }.mkString
      // AND over OR: split the chain at ORs, conjoin within groups
      val eval = (m: Map[String, Long]) => {
        val groups = scala.collection.mutable.ListBuffer(
          scala.collection.mutable.ListBuffer(leaves.head))
        conns.zip(leaves.tail).foreach { case (c, l) =>
          if (c == "OR") groups += scala.collection.mutable.ListBuffer(l)
          else groups.last += l
        }
        groups.exists(_.forall(_.eval(m)))
      }
      (sql, eval)
    }
    for ((sql, eval) <- cases(chainGen, 40))
      check(sql, rows.filter(eval))
  }

  test("the == rewrite composes with every corner the golden tests " +
    "pin: literals containing ==, comments containing quotes") {
    withRef()
    // a string literal with == must survive; == outside must rewrite
    val df = run("SELECT A FROM table1 " +
      "WHERE A == 922 -- trailing comment with 'quote and ==\n")
    assert(df.collect().map(_.getAs[Number](0).longValue).toSeq
      == rows.filter(_("A") == 922L).map(_("A")))
  }
}
