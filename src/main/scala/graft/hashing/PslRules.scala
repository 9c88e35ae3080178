package graft.hashing

import org.apache.spark.unsafe.types.UTF8String

/** Parsed public-suffix-list rule set + the registered-domain (eTLD+1)
  * lookup, per the published PSL algorithm (publicsuffix.org/list —
  * the reference data file is public; the ALGORITHM implemented here
  * is the spec's, not a port of any engine):
  *
  *  - a rule matches a host when its labels equal the host's
  *    right-most labels (`*` matching exactly one label);
  *  - the prevailing rule is any matching EXCEPTION rule (`!` prefix),
  *    else the LONGEST matching rule, else the implicit `*` default;
  *  - public suffix = the prevailing rule's labels (minus the leftmost
  *    label for an exception rule); registered domain = public suffix
  *    plus one more label, or NULL when the host IS a public suffix.
  *
  * Storage: three hash sets — normal rules verbatim, wildcard rules by
  * their tail (`*.ck` → "ck"), exception rules without the `!`. Lookup
  * walks the host's label-suffixes right-to-left building each suffix
  * incrementally, so a lookup is O(host length) with one hash probe
  * per label per set. The whole real-world PSL is ~10⁴ rules ≈ 200 KB
  * — it ships to executors inside the expression exactly like Spark's
  * own `InSet` literal sets do (no join, no shuffle, no per-row regex).
  *
  * Hosts and rules must be in the SAME form (both lowercase; both
  * punycode or both unicode) — no IDNA mapping happens here, matching
  * the raw-bytes contract of [[graft.functions.UrlFns]]. Comment lines
  * (`//…`) and blanks are accepted and skipped so a raw PSL file's
  * lines can be passed straight through. */
final class PslRules(rules: Iterable[String]) extends Serializable {

  private val normals = new java.util.HashSet[String]()
  private val wildcards = new java.util.HashSet[String]()   // tail after "*."
  private val exceptions = new java.util.HashSet[String]()  // without "!"

  rules.foreach { raw =>
    val r = raw.trim
    if (r.nonEmpty && !r.startsWith("//")) {
      if (r.startsWith("!")) exceptions.add(r.substring(1))
      else if (r.startsWith("*.")) wildcards.add(r.substring(2))
      else if (r != "*") normals.add(r)
    }
  }

  def size: Int = normals.size + wildcards.size + exceptions.size

  /** Registered domain of `host`, or null when the host is itself a
    * public suffix (incl. single-label hosts under the default rule) or
    * empty. */
  def registeredDomain(host: String): String = {
    if (host == null || host.isEmpty) return null
    val labels = host.split('.')
    val n = labels.length
    if (n == 0) return null
    // walk suffixes right-to-left, building each incrementally
    var suf: String = null      // suffix of k labels
    var prevSuf: String = null  // suffix of k-1 labels (wildcard tail)
    var excK = 0                // exception rule label count (0 = none)
    var matchK = 0              // longest normal/wildcard match
    var k = 1
    while (k <= n) {
      prevSuf = suf
      suf = if (suf == null) labels(n - k) else labels(n - k) + "." + suf
      if (exceptions.contains(suf) && excK == 0) excK = k
      if (normals.contains(suf)) matchK = k
      if (k >= 2 && wildcards.contains(prevSuf)) matchK = matchK.max(k)
      k += 1
    }
    // exception prevails: its public suffix drops the leftmost label
    val psLen = if (excK > 0) excK - 1 else if (matchK > 0) matchK else 1
    if (n <= psLen) null
    else labels.slice(n - psLen - 1, n).mkString(".")
  }

  /** UTF8String shim so the codegen'd kernel is a single call. */
  def registeredDomainU(host: UTF8String): UTF8String = {
    val r = registeredDomain(host.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}
