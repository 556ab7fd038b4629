package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PSL registered-domain (eTLD+1) as a single JVM expression.
  *
  * The column-expression spelling ([[graft.ops.Urls.registeredDomainRef]])
  * is a CASE tower over per-label-count `isin` probes; at the full
  * ~1235-rule snapshot the tower pushed whole-stage codegen past janino's
  * 64 KB method limit, silently dropping the ENTIRE stage (q54's link
  * graph) to the interpreted path. This expression replaces the tower
  * with hash-set lookups against the parsed rule sets (carried as plain
  * JVM references — rule-set size no longer touches generated-code size),
  * declared `CodegenFallback`, so the surrounding stage stays inside
  * whole-stage codegen and only this one call is interpreted — O(maxK)
  * set probes per row either way. Result strings are identical to the
  * column tower (same PSL algorithm, same label slicing, same IPv4 and
  * single-label pass-throughs) — bit-parity asserted in UrlsSpec over
  * every rule family.
  *
  * PSL algorithm (publicsuffix.org/list/): the registrable domain is the
  * LONGEST matching rule's suffix plus one label; a matching `!` exception
  * is itself the registrable domain; unknown TLDs fall back to the
  * default rule (`*`). */
case class RegisteredDomain(child: Expression,
                            exact: Set[String],
                            wildcardParents: Set[String],
                            exceptions: Set[String],
                            maxLabels: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"registered_domain needs a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "registered_domain"

  private val numericRe = java.util.regex.Pattern.compile("^[0-9.]+$")

  override protected def nullSafeEval(h: Any): Any = {
    val host = h.asInstanceOf[UTF8String].toString
    if (numericRe.matcher(host).find()) return UTF8String.fromString(host)
    // limit -1 keeps trailing empty labels — matching Spark's split()
    val labels = host.split("\\.", -1)
    val n = labels.length
    def lastK(k: Int): String = labels.slice(n - k, n).mkString(".")
    // longest rules first (the column tower wraps them outermost)
    var k = maxLabels
    while (k >= 2) {
      if (n >= k && exceptions.contains(lastK(k)))
        return UTF8String.fromString(lastK(k))
      if (n >= k + 1) {
        val exactHit = exact.contains(lastK(k))
        val wildHit = k >= 2 && wildcardParents.contains(lastK(k - 1)) &&
          !exceptions.contains(lastK(k))
        if (exactHit || wildHit) return UTF8String.fromString(lastK(k + 1))
      }
      k -= 1
    }
    UTF8String.fromString(if (n >= 2) lastK(2) else host)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegisteredDomain {
  def column(host: Column, exact: Set[String], wildcardParents: Set[String],
             exceptions: Set[String], maxLabels: Int): Column =
    Bridge.column(RegisteredDomain(Bridge.expression(host),
      exact, wildcardParents, exceptions, maxLabels))
}
