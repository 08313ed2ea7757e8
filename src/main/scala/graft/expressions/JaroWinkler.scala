package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The standard textbook Jaro-Winkler kernel over UTF-8 BYTES, shared by
  * the interpreted and generated paths of [[JaroWinkler]].
  *
  * Semantics pinned to DuckDB 1.0's `jaro_winkler_similarity` (verified
  * against the textbook cases MARTHA/MARHTA = 0.9611…, DWAYNE/DUANE =
  * 0.84, and the boost-threshold probe): match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions counted over match order, prefix
  * boost l·0.1·(1−jaro) applied ONLY when jaro > 0.7, prefix capped at
  * 4. Byte-level is not a shortcut here — it is DuckDB's OWN semantics:
  * its kernel walks raw string bytes, so on non-ASCII input the byte
  * reading (müller/muller = 0.86428…, ü being two bytes) is what DuckDB
  * 1.0 returns, NOT the codepoint reading (0.9). JaroWinklerSpec pins
  * six non-ASCII cases to captured DuckDB outputs, so oracle parity
  * holds on any corpus, not just ASCII fixtures.
  */
object JaroWinklerKernel {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var k = lo
      var found = false
      while (k < hi && !found) {
        if (!m2(k) && s2(k) == s1(i)) {
          m1(i) = true; m2(k) = true; matches += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - transpositions / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1(prefix) == s2(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Codegen'd Jaro-Winkler similarity over two string columns — the fuzzy
  * entity-resolution scorer (complement to d14's edit-distance join:
  * levenshtein counts operations, Jaro-Winkler rewards shared prefixes
  * and tolerates transpositions, the right metric for name/identifier
  * matching). Registered in SQL as `jaro_winkler` via GraftExtensions;
  * both paths call the single shared byte-level kernel, so interpreted,
  * generated, and oracle (DuckDB `jaro_winkler_similarity`) values
  * agree bitwise on ASCII inputs.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects two string args, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = JaroWinklerKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel.similarity($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}
