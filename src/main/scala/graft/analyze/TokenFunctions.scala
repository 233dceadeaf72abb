package graft.analyze

import java.net.{URI, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** The rest of the reference's tokenizer `Function` surface (SURVEY.md §2.3):
  * generator-shaped scalar functions, each `String => Seq[String]`, chained
  * per field. The transcripts rebuild needs only F1-F3 + P6 on the hot path;
  * these are provided for parity of the function library and are covered by
  * TokenFunctionsSpec.
  *
  * All are plain deterministic Scala usable from typed flatMaps; none touch
  * the indexing hot path unless configured into a field's analyzer chain.
  */
object TokenFunctions {

  /** F3 `split`: regex split (SplitFunction.java:9-35). */
  def split(sep: String)(s: String): Seq[String] =
    if (s == null) Seq.empty else s.split(sep).toSeq.filter(_.nonEmpty)

  /** Full P6 token-quality predicate — row-by-row port of the reference's
    * segmentNeedOutput (plugin/Function/TextFunction.java:40-61) with
    * Util.java's character classes (:57-126), check order preserved:
    *  - empty → drop;
    *  - "Chinese" — Util.IsChinese is an ASCII round-trip test, i.e. ANY
    *    non-ASCII char, not a CJK range check — keep iff len ≥ 2;
    *  - all-digit (Character.isDigit) → keep iff len ≥ 5;
    *  - 0x-prefixed hex (`^0x[a-fA-F0-9]+` fully matched) → keep iff len ≥ 6;
    *  - otherwise → keep iff 4 ≤ len ≤ 128 AND GBK-encodable
    *    (Util.IsUnReadable: '?'→' ', encode GBK, any 0x3f byte → drop;
    *    unreachable for the pure-ASCII tokens this branch implies, kept for
    *    fidelity — an unsupported-charset JVM drops, like the reference's
    *    catch).
    * Lengths are UTF-16 code units, as in the reference (a supplementary-
    * plane ideograph counts 2). */
  def qualityKeep(t: String): Boolean = {
    if (t == null || t.isEmpty) return false
    var i = 0
    while (i < t.length) {
      if (t.charAt(i) >= 0x80) return t.length >= 2 // the "Chinese" branch
      i += 1
    }
    var allDigit = true
    i = 0
    while (allDigit && i < t.length) { allDigit = Character.isDigit(t.charAt(i)); i += 1 }
    if (allDigit) return t.length >= 5
    if (isHex0x(t)) return t.length >= 6
    if (t.length < 4 || t.length > 128) return false
    !isUnReadableGbk(t)
  }

  private def isHex0x(t: String): Boolean = {
    if (t.length <= 2 || t.charAt(0) != '0' || t.charAt(1) != 'x') return false
    var i = 2
    while (i < t.length) {
      val c = t.charAt(i)
      val hex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      if (!hex) return false
      i += 1
    }
    true
  }

  private def isUnReadableGbk(t: String): Boolean =
    try t.replace('?', ' ').getBytes("GBK").exists(_ == 0x3f)
    catch { case _: Exception => true }

  /** Public-suffix labels the reference skips as the FIRST registrable-domain
    * combo (Util.java:30-40: com edu gov net org cn hk). */
  val PublicSuffixes: Set[String] = Set("com", "edu", "gov", "net", "org", "cn", "hk")

  /** F4 `url`: URI-normalize and emit the reference's full variant set
    * (plugin/Util.java:226-313 ParseUrl, UrlFunction.java:11-25):
    * full url; host; host:port (the port then rides on every later combo,
    * like the reference's mutated `host` variable); registrable-domain
    * suffix combos walked right-to-left, skipping the 2-label suffix whose
    * left label is a public suffix (e.g. `com.cn`); host/path1; path1/path2;
    * host/p1/p2/p3. Divergence by design: input is lowercased and a missing
    * scheme defaults to http:// so bare domains parse. */
  def urlVariants(s: String): Seq[String] = {
    if (s == null || s.isEmpty) return Seq.empty
    val trimmed = s.trim.toLowerCase(java.util.Locale.ROOT)
    if (trimmed.isEmpty) return Seq.empty
    val out = scala.collection.mutable.LinkedHashSet[String](trimmed)
    try {
      val withScheme = if (trimmed.contains("://")) trimmed else "http://" + trimmed
      val u = new URI(withScheme).normalize()
      var host = Option(u.getHost).getOrElse(return out.toSeq)
      out += host
      if (u.getPort > 0) { host = s"$host:${u.getPort}"; out += host }
      // registrable-domain suffix combos (Util.java:259-273)
      val parts = host.split('.')
      val len = parts.length
      if (len > 2) {
        var partHost = parts(len - 1)
        var i = len - 2
        while (i > 0) {
          partHost = parts(i) + "." + partHost
          if (!(i == len - 2 && PublicSuffixes.contains(parts(i)))) out += partHost
          i -= 1
        }
      }
      val segs = Option(u.getPath).getOrElse("").split('/').filter(_.nonEmpty).toSeq
      if (segs.length >= 1) out += s"$host/${segs(0)}"
      if (segs.length >= 2) out += s"${segs(0)}/${segs(1)}"
      if (segs.length >= 3) out += s"$host/${segs(0)}/${segs(1)}/${segs(2)}"
      out.toSeq
    } catch { case _: Exception => out.toSeq }
  }

  /** F5 `path`: split a Windows path on backslashes; emit full path, each
    * component, and adjacent pairs (Util.java:189-224, PathFunction.java). */
  def pathVariants(s: String): Seq[String] = {
    if (s == null || s.isEmpty) return Seq.empty
    val p = s.trim.toLowerCase(java.util.Locale.ROOT)
    val comps = p.split("[\\\\/]+").filter(_.nonEmpty).toSeq
    val pairs = comps.sliding(2).filter(_.length == 2).map(_.mkString("\\")).toSeq
    (Seq(p) ++ comps ++ pairs).distinct
  }

  /** F6 `pathWithUrlencode`: same over urlencoded %5c separators
    * (PathWithUrlencodeFunction.java:9-66). */
  def pathUrlencodedVariants(s: String): Seq[String] =
    pathVariants(urldecode(s).headOption.getOrElse(""))

  /** F7 `ip`: emit the full IPv4 plus its /24 prefix
    * (Util.java:167-187, IpFunction.java). */
  def ipVariants(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    val ip = s.trim
    val IpRe = "^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$".r
    ip match {
      case IpRe(a, b, c, _) if Seq(a, b, c).forall(_.toInt <= 255) =>
        Seq(ip, s"$a.$b.$c")
      case _ => Seq.empty
    }
  }

  /** F8 `urldecode` (UrlDecodeFunction.java:9-29; utf-8 with fallback). */
  def urldecode(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    try Seq(URLDecoder.decode(s, StandardCharsets.UTF_8))
    catch { case _: Exception => Seq(s) }
  }

  /** F8 `urlencode` (UrlEncodeFunction.java:10-38). */
  def urlencode(s: String): Seq[String] =
    if (s == null) Seq.empty else Seq(URLEncoder.encode(s, StandardCharsets.UTF_8))

  /** F9 `base64decode` (Base64DecodeFunction.java:11-25, Util.java:315-332). */
  def base64decode(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    try Seq(new String(Base64.getDecoder.decode(s.trim), StandardCharsets.UTF_8))
    catch { case _: Exception => Seq.empty }
  }

  /** F9 with the reference's optional zlib-inflate step
    * (Util.java:315-332 Base64DecoderStr flag=true: base64 -> inflate ->
    * utf-8; the INPUT passes through on any failure, mirroring the
    * reference's catch). */
  def base64decodeInflate(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    try {
      val bytes = Base64.getDecoder.decode(s.trim)
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.InflaterOutputStream(bos)
      zos.write(bytes)
      zos.close()
      Seq(new String(bos.toByteArray, StandardCharsets.UTF_8))
    } catch { case _: Exception => Seq(s) }
  }

  /** P4 blacklist filter with 1-in-N deterministic sampling: drop
    * blacklisted tokens entirely when precision == 0; otherwise pass exactly
    * one occurrence per `precision` sightings — the reference fires on
    * count % precision == 5 % precision (FilterFunction.java:11-31,
    * TokenFilter.java:14-61). This is Poseidon's stopword/skew guard; the
    * rebuild's primary skew answer is chunked postings (IndexBuilder), this
    * exists for semantic parity and is exact-count tested like
    * FilterFunctionTest.java:38-68. NOTE: stateful per instance — use one
    * instance per partition (mapPartitions), as the reference uses one per
    * mapper.
    */
  final class BlacklistFilter(blacklist: Set[String], precision: Int) extends Serializable {
    private val counts = scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
    def apply(token: String): Boolean = {
      if (!blacklist.contains(token)) true
      else if (precision <= 0) false
      else {
        val c = counts(token) + 1
        counts(token) = c
        c % precision == 5 % precision
      }
    }
  }

  /** P5 regex check: keep token iff it matches (RegexCheck.java:11-45;
    * the reference supplies the pattern base64-encoded in config). */
  def regexCheck(pattern: String): String => Boolean = {
    val re = pattern.r
    (s: String) => s != null && re.pattern.matcher(s).matches()
  }
}
