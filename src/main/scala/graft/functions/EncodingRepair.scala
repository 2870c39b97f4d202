package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake repair (SURVEY §2 D129) — the ftfy-class fix for UTF-8
  * text that was mis-decoded as windows-1252 somewhere upstream
  * ("Ã©" for "é", "â€™" for "’"): the single most common encoding
  * damage in real crawls, and one D13's NFC/casefold normalization
  * passes straight through (NFC canonicalizes codepoints, it cannot
  * know two of them used to be one UTF-8 sequence).
  *
  * Mechanism: an EXPLICIT repair table. For each target codepoint t,
  * the mojibake image is the character sequence you get by decoding
  * t's UTF-8 bytes with the WHATWG `windows-1252` decoder (the one
  * browsers actually apply, https://encoding.spec.whatwg.org — unlike
  * Java's CP1252 it maps the five unassigned bytes 81/8D/8F/90/9D to
  * the C1 controls U+0081.., so "”" = E2 80 9D has a defined image).
  * Repair applies `replace(all)` per entry, LONGEST image first (all
  * 3-byte images begin with "â", all 2-byte with "Ã"/"Â", and "Â",
  * "Ã", "â" themselves are excluded as targets — so no replacement
  * output can seed a later pattern, making the chain order-stable and
  * exactly replayable by an independent engine).
  *
  * Scale/codegen: the chain is ~100 builtin `replace` calls — all
  * inside whole-stage codegen, a narrow projection over the scan (no
  * UDF, no shuffle). Residual risk (documented): a LEGITIMATE "Â©"
  * in clean text is indistinguishable from mojibake "©" — the
  * classic repair false-positive; callers gate on a mojibake-density
  * heuristic if their corpus legitimately mixes the two.
  *
  * The same table renders the DuckDB oracle chain ([[repairSql]]) —
  * the table IS the spec; UrlEncodingSpec pins the classic ladder
  * (Ã©→é, â€™→’, Â£→£, ÃŸ→ß, â‚¬→€, …) byte-exactly.
  */
object EncodingRepair {

  /** WHATWG windows-1252: bytes 0x80–0x9F (index 0–31). */
  private val w1252Hi: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026',
    '\u2020', '\u2021', '\u02C6', '\u2030', '\u0160', '\u2039',
    '\u0152', '\u008D', '\u017D', '\u008F', '\u0090', '\u2018',
    '\u2019', '\u201C', '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A', '\u0153', '\u009D',
    '\u017E', '\u0178')

  /** Decode one byte with the WHATWG windows-1252 single-byte table. */
  private def w1252(b: Int): Char =
    if (b >= 0x80 && b <= 0x9F) w1252Hi(b - 0x80) else b.toChar

  /** The mojibake image of a string: its UTF-8 bytes read back
    * through WHATWG windows-1252.
    */
  private[graft] def mojibake(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => w1252(b & 0xff)).mkString

  /** Repair targets: Latin-1 supplement letters + symbols (minus the
    * three chars that ARE mojibake lead images: Â U+00C2, Ã U+00C3,
    * â U+00E2 — repairing those needs the double-encoding pass this
    * single-level table deliberately does not attempt) and the
    * windows-1252 punctuation ladder.
    */
  private[graft] val targets: Seq[String] =
    ((0xA0 to 0xFF).filterNot(cp => cp == 0xC2 || cp == 0xC3 || cp == 0xE2)
      .map(cp => cp.toChar.toString)) ++
      Seq("‘", "’", "“", "”", "„", "‚",
        "–", "—", "…", "•", "‹", "›",
        "€", "™")

  /** (mojibakeImage, fixed) pairs, longest image first (then by
    * codepoint — a total, engine-independent order).
    */
  private[graft] val table: Seq[(String, String)] =
    targets.map(t => (mojibake(t), t))
      .sortBy { case (m, t) => (-m.length, t) }

  /** The repair chain as a Column transform (all-builtin codegen). */
  def repair(c: Column): Column =
    table.foldLeft(c) { case (acc, (m, t)) =>
      call_function("replace", acc, lit(m), lit(t))
    }

  /** The identical chain rendered as DuckDB SQL over `inner`. */
  def repairSql(inner: String): String =
    table.foldLeft(inner) { case (acc, (m, t)) =>
      s"replace($acc, '${sqlEsc(m)}', '${sqlEsc(t)}')"
    }

  private[graft] def sqlEsc(s: String): String = s.replace("'", "''")

  /** Clean test phrases for the D129 face — every non-ASCII char is a
    * repair-table target, so mojibake(phrase) repairs back
    * byte-exactly. Kept here so face, oracle and spec share one list.
    */
  private[graft] val phrases: Seq[String] = Seq(
    "café déjà vu",
    "naïve façade",
    "l’été — c’est ça",
    "“smart quotes” … fin",
    "über señor piñata",
    "Ærø smørrebrød",
    "¡hola! ¿qué tal? ±3°",
    "price € 25 • TM ™ £9")
}
