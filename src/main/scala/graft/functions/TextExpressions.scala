package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The mojibake-repair kernel behind [[FixMojibake]] — static so the
  * generated code calls one monomorphic method (the Spark convention
  * for string expressions whose kernel is too big to inline).
  *
  * Repairs the single most common real-corpus corruption (the ftfy
  * `fix_encoding` core, the C4/Dolma `fix_text` step): UTF-8 bytes
  * that were DECODED as Windows-1252/Latin-1 somewhere upstream, so
  * "café" arrives as "cafÃ©" and "—" as "â€”". The repair is the exact
  * inverse: map each char back to its cp1252 byte (identity for
  * 0x00–0x7F and 0xA0–0xFF, the published cp1252 table for the
  * 0x80–0x9F window, C1 controls accepted as the Latin-1 reading of
  * the five undefined cp1252 bytes) and strictly re-decode as UTF-8.
  *
  * Safety rule (ftfy's own argument): the repair applies ONLY when the
  * whole string round-trips — every char maps to a byte AND the byte
  * string is valid UTF-8 AND the decode actually shrinks the string
  * (a genuine multi-byte repair always does; correctly-encoded text
  * reinterpreted this way is almost never valid UTF-8, so it returns
  * unchanged). Runs to a fixed point (≤ 3 rounds) so double-corrupted
  * text ("CafÃƒÂ©") repairs fully. Deterministic, allocation-bounded
  * by the input length, no locale anywhere. */
object MojibakeKernel {
  /** cp1252 byte for `c`, or -1 when unmappable. */
  private def cp1252Byte(c: Char): Int = c match {
    case c if c < 0x80 => c.toInt
    case c if c >= 0xA0 && c <= 0xFF => c.toInt
    // the Latin-1 reading of bytes 0x80-0x9F (C1 controls) — covers
    // upstreams that decoded as ISO-8859-1 instead of cp1252
    case c if c >= 0x80 && c <= 0x9F => c.toInt
    case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
    case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
    case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
    case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
    case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
    case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
    case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
    case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
    case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
    case _ => -1
  }

  private def repairOnce(s: String): String = {
    // fast gate: pure-ASCII text cannot be mojibake
    var hasHigh = false
    var i = 0
    while (i < s.length && !hasHigh) { hasHigh = s.charAt(i) >= 0x80; i += 1 }
    if (!hasHigh) return s
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val b = cp1252Byte(s.charAt(i))
      if (b < 0) return s // a char cp1252 can't carry: not this corruption
      bytes(i) = b.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < s.length) out else s
    } catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    var cur = str
    var rounds = 0
    var changed = true
    while (changed && rounds < 3) {
      val next = repairOnce(cur)
      changed = next ne cur
      cur = next
      rounds += 1
    }
    if (cur eq str) s else UTF8String.fromString(cur)
  }
}

/** `graft_fix_mojibake(text)` — repair UTF-8-decoded-as-cp1252 text
  * ([[MojibakeKernel]]). A native codegen'd expression: the kernel is
  * one static call inside whole-stage codegen — no UDF boxing, no
  * interpreter fallback in the hot scan path. */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override def nullSafeEval(v: Any): Any =
    MojibakeKernel.repair(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MojibakeKernel.repair($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The NFC kernel behind [[NfcNormalize]] — static for the same
  * monomorphic-codegen reason as [[MojibakeKernel]]. Fast path:
  * `Normalizer.isNormalized` (a scan, no allocation) skips the rebuild
  * for the overwhelmingly-common already-NFC input. */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` — Unicode NFC normalization (canonical
  * composition), the text-cleanup companion of [[FixMojibake]]: the
  * SAME visible text arrives from different sources precomposed
  * ("é" = U+00E9) or decomposed ("e" + U+0301) — macOS filenames,
  * some OCR and PDF extractors emit NFD — and every byte-level stage
  * (exact-dedup digests, shingles, substring windows, tokenizer
  * merges) treats the two as different documents. NFC is canonical
  * (visible text unchanged, unlike NFKC's compatibility folding —
  * ligatures and superscripts stay). Native codegen'd expression,
  * one static call, no UDF boxing. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    NfcKernel.nfc(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcKernel.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The tag-stack HTML tokenizer behind [[HtmlBlocks]] — the DOM-grade
  * rung above the C4-grade regex chain ([[graft.operators.TextAnalysis
  * .extractHtmlText]]/`htmlMainText`), whose stated limitation this
  * closes: the regexes are QUOTE-BLIND, so a literal '>' inside an
  * attribute value (`<p data-note="x > y">`) ends the tag early and
  * leaks `y">` into the visible text — real on messy crawl HTML. This
  * kernel walks characters once, tracking attribute-quote state, so a
  * tag ends only at a '>' OUTSIDE quotes; everything else matches the
  * regex chain's semantics on well-formed HTML (the agreeing subdomain
  * the regex twin oracles): script/style elements vanish WITH content,
  * comments vanish, the five basic entities + `&amp;` and bounded
  * NUMERIC character references (`&#233;`/`&#xE9;`, r17 — invalid or
  * out-of-range codepoints stay literal) decode in one
  * non-rescanning pass (so `&amp;lt;` is the literal `&lt;`),
  * whitespace runs collapse, blocks segment at the jusText block-tag
  * vocabulary, anchors never span blocks, and a lone `<` before a
  * non-letter is TEXT (where the quote-blind strip would eat to the
  * next '>' — the other half of the same defect).
  *
  * Emits one row per block: (visible text, anchor-visible char count —
  * the jusText link-density numerator — and a heading flag), so the
  * classification gates stay DECLARATIVE over the array (filter /
  * transform, no UDF): the kernel is pure tokenization, one static
  * monomorphic call inside whole-stage codegen. Deterministic,
  * single-pass, allocation bounded by the input length. Malformed-
  * input stances (documented divergences from the regex twin, which
  * has no coherent stance on them): an unclosed comment comments out
  * the rest of the input; an unclosed script/style tag strips the open
  * tag and treats the content as text; a tagless trailing `<abc` is
  * text. */
object HtmlKernel {
  private val blockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5",
    "h6", "li", "ul", "ol", "dl", "dt", "dd", "nav", "footer", "header",
    "aside", "section", "article", "main", "table", "thead", "tbody",
    "tr", "td", "th", "blockquote", "form", "pre")

  // the java-regex \s set (the twin collapses with "\\s+")
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isAsciiLetterOrDigit(c: Char): Boolean =
    isAsciiLetter(c) || (c >= '0' && c <= '9')

  /** Whitespace-collapsed, trimmed copy (== regexp_replace \s+ -> " "
    * then trim). */
  private def collapse(sb: CharSequence): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var pending = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (isSpace(c)) pending = true
      else {
        if (pending && out.length > 0) out.append(' ')
        out.append(c)
        pending = false
      }
      i += 1
    }
    out.toString
  }

  /** Decoded char + consumed length for an entity at `i`, or 0 when the
    * '&' is literal. One forward pass, never re-scanned — `&amp;lt;`
    * decodes to the literal "&lt;", exactly the twin's pass order. */
  private def entityAt(s: String, i: Int): Int = {
    if (s.startsWith("&lt;", i)) ('<' << 8) | 4
    else if (s.startsWith("&gt;", i)) ('>' << 8) | 4
    else if (s.startsWith("&quot;", i)) ('"' << 8) | 6
    else if (s.startsWith("&#39;", i)) ('\'' << 8) | 5
    else if (s.startsWith("&nbsp;", i)) (' ' << 8) | 6
    else if (s.startsWith("&amp;", i)) ('&' << 8) | 5
    else 0
  }

  /** Numeric character reference at `i` (r17 — `&#233;` / `&#xE9;`,
    * ubiquitous in non-English crawl HTML): packed
    * (codepoint << 4 | consumed length), or 0 when the text at `i` is
    * not a VALID bounded reference — digits capped at 7 decimal / 6 hex
    * (enough for every Unicode scalar, so `&#99999999999;` is literal
    * text, not an overflow), terminator `;` required, and codepoints
    * that are 0, surrogates (U+D800–DFFF), or past U+10FFFF pass
    * through literally — the twin regex stage states the same bounds.
    * Length ≤ 12 fits the 4 packed bits; codepoint ≤ 0x10FFFF the
    * remaining 21. Tried BEFORE [[entityAt]], so `&#39;` keeps its
    * historical decode and `&amp;#233;` (the & is an entity, the rest
    * text) still resolves through the named path. */
  private def numericAt(s: String, i: Int): Int = {
    val n = s.length
    if (i + 2 >= n || s.charAt(i) != '&' || s.charAt(i + 1) != '#') return 0
    val hex = s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X'
    val d0 = i + (if (hex) 3 else 2)
    var j = d0
    var cp = 0L
    val maxDigits = if (hex) 6 else 7
    while (j < n && j - d0 < maxDigits + 1 && {
      val c = s.charAt(j)
      if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')
      else c >= '0' && c <= '9'
    }) {
      val c = s.charAt(j)
      val d = if (c <= '9') c - '0'
        else if (c <= 'F') c - 'A' + 10 else c - 'a' + 10
      cp = cp * (if (hex) 16 else 10) + d
      j += 1
    }
    if (j == d0 || j - d0 > maxDigits) return 0 // no digits, or unbounded
    if (j >= n || s.charAt(j) != ';') return 0
    if (cp == 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return 0
    ((cp.toInt) << 4) | (j + 1 - i)
  }

  /** Index just past `</name[\s]*>` at/after `from`, case-insensitive,
    * or -1. */
  private def indexOfClose(s: String, from: Int, name: String): Int = {
    val target = "</" + name
    val n = s.length
    var i = from
    while (i + target.length <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) {
        var j = i + target.length
        while (j < n && isSpace(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == '>') return j + 1
      }
      i += 1
    }
    -1
  }

  def blocks(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.InternalRow
    val s = input.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var txt = new java.lang.StringBuilder
    var anchors = List.empty[String] // reversed; per-block
    var anchorBuf: java.lang.StringBuilder = null // non-null inside <a>
    var heading = false

    def flush(nextHeading: Boolean): Unit = {
      // an anchor never spans blocks: the twin's per-block capture
      // needs open AND close inside one block, so a dangling open
      // contributes nothing
      anchorBuf = null
      val la = collapse(anchors.reverse.mkString(" ")).length
      out += InternalRow(UTF8String.fromString(collapse(txt)), la, heading)
      txt = new java.lang.StringBuilder
      anchors = Nil
      heading = nextHeading
    }
    def emit(c: Char): Unit = {
      txt.append(c)
      if (anchorBuf != null) anchorBuf.append(c)
    }
    def emitCp(cp: Int): Unit = { // astral refs need a surrogate pair
      txt.appendCodePoint(cp)
      if (anchorBuf != null) anchorBuf.appendCodePoint(cp)
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val nr = numericAt(s, i)
        if (nr != 0) { emitCp(nr >>> 4); i += nr & 0xf }
        else {
          val e = entityAt(s, i)
          if (e == 0) { emit('&'); i += 1 }
          else { emit((e >> 8).toChar); i += e & 0xff }
        }
      } else if (c != '<') { emit(c); i += 1 }
      else if (s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4)
        emit(' ')
        i = if (e >= 0) e + 3 else n
      } else {
        val closing = i + 1 < n && s.charAt(i + 1) == '/'
        val ns = i + (if (closing) 2 else 1)
        val first = if (ns < n) s.charAt(ns) else ' '
        if (!closing && ns < n && (first == '!' || first == '?')) {
          // doctype / markup declaration / PI: to the next '>'
          val e = s.indexOf('>', ns)
          emit(' ')
          i = if (e >= 0) e + 1 else n
        } else if (ns >= n || !isAsciiLetter(first)) {
          emit('<'); i += 1 // "5 < 6": a lone '<' is text, not a tag
        } else {
          var ne = ns + 1
          while (ne < n && isAsciiLetterOrDigit(s.charAt(ne))) ne += 1
          val name = s.substring(ns, ne).toLowerCase(java.util.Locale.ROOT)
          // THE fix: the tag ends at '>' OUTSIDE attribute quotes
          var j = ne
          var q = 0.toChar
          var end = -1
          while (j < n && end < 0) {
            val ch = s.charAt(j)
            if (q != 0) { if (ch == q) q = 0 }
            else if (ch == '"' || ch == '\'') q = ch
            else if (ch == '>') end = j
            j += 1
          }
          if (end < 0) { emit('<'); i += 1 } // never closes: text
          else if (!closing && (name == "script" || name == "style")) {
            val close = indexOfClose(s, end + 1, name)
            emit(' ')
            i = if (close >= 0) close else end + 1
          } else {
            if (!closing && blockTags.contains(name))
              flush(name.length == 2 && name.charAt(0) == 'h' &&
                name.charAt(1) >= '1' && name.charAt(1) <= '6')
            if (name == "a" && !closing) {
              txt.append(' ')
              // a nested open inside an anchor is inner markup (the
              // twin's non-greedy capture keeps it, tag-stripped)
              if (anchorBuf == null) anchorBuf = new java.lang.StringBuilder
              else anchorBuf.append(' ')
            } else if (name == "a" && closing) {
              if (anchorBuf != null) {
                anchors = anchorBuf.toString :: anchors
                anchorBuf = null
              }
              txt.append(' ')
            } else emit(' ')
            i = end + 1
          }
        }
      }
    }
    flush(false)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `graft_html_blocks(html)` — tokenize HTML into classification-ready
  * blocks ([[HtmlKernel]]): array of (txt = visible text, la =
  * anchor-visible chars, hd = heading). Native codegen'd expression —
  * one static kernel call in the scan, gates stay declarative over the
  * returned array. */
case class HtmlBlocks(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("txt", StringType, nullable = false),
    StructField("la", IntegerType, nullable = false),
    StructField("hd", BooleanType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_html_blocks"

  override def nullSafeEval(v: Any): Any =
    HtmlKernel.blocks(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlKernel.blocks($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Column API for [[FixMojibake]]. */
  def fixMojibake(c: Column): Column =
    Bridge.column(FixMojibake(Bridge.expression(c)))

  /** Column API for [[NfcNormalize]]. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** Column API for [[HtmlBlocks]]. */
  def htmlBlocks(c: Column): Column =
    Bridge.column(HtmlBlocks(Bridge.expression(c)))
}
