package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the Unicode/compression text expressions —
  * static methods compiled into WholeStageCodegen via `StaticInvoke`
  * (see [[graft.functions.expressions.Kernels.nfcStrip]] /
  * [[graft.functions.expressions.Kernels.deflateLen]]), the same
  * pattern as [[Wkb.box]]: one direct static call per row, no
  * interpreted lambdas, null-propagating at the expression layer.
  *
  * Cross-engine contract: `nfcStrip` = Unicode NFC normalization
  * followed by accent stripping (NFD → drop nonspacing marks → NFC),
  * which replays in the DuckDB oracle as
  * `strip_accents(nfc_normalize(text))` — both sides implement
  * UAX #15 + Mn-mark removal, verified equal on accented/fullwidth/
  * combining-char fixtures (StorageTypeSpec + the t15 oracle).
  */
object UnicodeText {

  /** NFC-normalize, then strip accents (NFD, drop Mn marks, NFC). */
  def nfcStrip(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    // fast path: accent-free NFC text (all ASCII) round-trips unchanged
    var ascii = true
    var i = 0
    while (ascii && i < nfc.length) {
      if (nfc.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return UTF8String.fromString(nfc)
    val nfd = Normalizer.normalize(nfc, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  /** zlib (Deflate, level 6) compressed size of the UTF-8 bytes — the
    * numerator of the Gopher-style compression-ratio quality signal.
    * Deterministic for a given zlib build; the t16 checks compare it
    * only through wide-margin inequalities, so they are stable across
    * zlib versions too. */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
