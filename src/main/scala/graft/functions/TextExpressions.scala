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

object TextFunctions {
  /** Column API for [[FixMojibake]]. */
  def fixMojibake(c: Column): Column =
    Bridge.column(FixMojibake(Bridge.expression(c)))

  /** Column API for [[NfcNormalize]]. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
