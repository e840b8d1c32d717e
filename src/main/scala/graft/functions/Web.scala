package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus scalar helpers — the two transforms between a parsed WARC
  * response and the documents-table schema. Both are compositions of
  * codegen'd built-ins (regexp_replace/lower/concat): they stay inside
  * WholeStageCodegen and need no custom expression.
  */
object Web {

  /** Visible text of an HTML payload: script/style/comment subtrees
    * dropped, tags stripped, the half-dozen entities that dominate real
    * text decoded, whitespace collapsed. Deliberately a lexical strip,
    * not a DOM: the quality cascade downstream is robust to imperfect
    * extraction, and a real boilerplate remover (trafilatura-class) is
    * a model, not a string function. */
  def htmlText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</\\1>|<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    // &amp; decodes LAST — it is the escape for the escape character, so
    // decoding it first would double-decode '&amp;lt;' (visible text
    // '&lt;') into '<'
    val entities = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(from), to)
      }
    trim(regexp_replace(entities, "\\s+", " "))
  }

  /** Canonical URL for dedup keys: lowercase scheme+authority, default
    * ports dropped, fragment dropped, tracking params (utm_*, fbclid,
    * gclid) dropped, dangling ?/& tidied. Everything semantic-
    * preserving per RFC 3986 §6 plus the tracking-param convention —
    * aggressive enough that the same page claimed from two crawls
    * collides, conservative enough that distinct queries don't. */
  def urlNormalize(url: Column): Column = {
    val noFragment = regexp_replace(url, "#.*$", "")
    val lowered = concat(
      lower(regexp_extract(noFragment, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)),
      regexp_replace(noFragment, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", ""))
    // default ports are scheme-specific: stripping :443 from http (or
    // :80 from https) would collide genuinely distinct origins
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?]*):80(?=[/?]|$)", "$1"),
      "^(https://[^/:?]*):443(?=[/?]|$)", "$1")
    val noTracking = regexp_replace(noPort,
      "(?<=[?&])(?:utm_[A-Za-z]+|fbclid|gclid)=[^&]*&?", "")
    regexp_replace(noTracking, "[?&]+$", "")
  }
}
