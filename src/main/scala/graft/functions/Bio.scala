package graft.functions

/** BIO tag codec mirroring the reference's span extraction and markup
  * writers (ner/Datasets/MyDataset.py:33-109). Pure functions used
  * inside typed `map`s; property-tested (encode∘decode roundtrip).
  */
object Bio {

  /** BIO decode → entity spans — MyDataset.get_spans
    * (MyDataset.py:33-65). Notable reference semantics preserved
    * exactly:
    *  - `I-X` with no open entity OPENS one (line 52-56);
    *  - `I-Y` while inside an X entity merges the token and RETAGS
    *    the whole span to Y (current_tag is overwritten, line 57);
    *  - an open entity at end-of-sequence is flushed (lines 60-62).
    */
  def decode(tokens: Seq[String], bioTags: Seq[String]): List[(String, String)] = {
    val out = List.newBuilder[(String, String)]
    var curEntity: String = null
    var curTag: String = null
    tokens.zip(bioTags).foreach { case (token, nerTag) =>
      if (nerTag == "O") {
        if (curEntity != null) { out += ((curEntity, curTag)); curEntity = null; curTag = null }
      } else {
        val dash = nerTag.indexOf('-')
        val prefix = nerTag.substring(0, dash)
        val entityType = nerTag.substring(dash + 1)
        if (prefix == "B") {
          if (curEntity != null) out += ((curEntity, curTag))
          curEntity = token
          curTag = entityType
        } else if (prefix == "I") {
          if (curEntity != null) curEntity = curEntity + " " + token
          else curEntity = token
          curTag = entityType
        }
      }
    }
    if (curEntity != null) out += ((curEntity, curTag))
    out.result()
  }

  /** BIO encode for clean spans (inverse of decode on well-formed
    * input); used by the synthetic corpus generator to produce
    * (tokens, ner_tags) fixtures with exact gold. */
  def encode(tokens: Seq[String], spans: Seq[(Int, Int, String)]): Seq[String] = {
    val tags = Array.fill(tokens.length)("O")
    spans.foreach { case (start, end, tag) =>
      var i = start
      while (i < end && i < tokens.length) {
        tags(i) = (if (i == start) "B-" else "I-") + tag
        i += 1
      }
    }
    tags.toSeq
  }

  /** GPT-NER style @@…## markup for one tag — MyDataset
    * .add_llama_ner_tags (MyDataset.py:68-101). Returns the marked
    * text for the requested tag (the reference builds a
    * dict[tag -> text]; callers map over tags). */
  def markupAtAt(tokens: Seq[String], bioTags: Seq[String], tag: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var current = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = if (current.nonEmpty) {
      current(0) = "@@" + current(0)
      current(current.length - 1) = current(current.length - 1) + "##"
      out ++= current
      current = scala.collection.mutable.ArrayBuffer.empty[String]
    }
    tokens.zip(bioTags).foreach { case (token, entTag) =>
      if (entTag.startsWith("B") && entTag.drop(2) == tag) {
        flush()
        current += token
      } else if (entTag.startsWith("I") && entTag.drop(2) == tag && current.nonEmpty) {
        current += token
      } else if (current.nonEmpty) {
        flush()
        out += token
      } else {
        out += token
      }
    }
    flush()
    out.mkString(" ")
  }

  /** XML-ish wrap markup — MyDataset.add_llama_ner_tags_2
    * (MyDataset.py:104-109): dict-dedup spans by mention (last tag
    * wins, first-occurrence order), then replace ALL occurrences of
    * each mention with `<word>m</word>`; the 4-tag CoNLL set maps
    * abbreviations to words (mapping at prompts.py:335). */
  def markupXml(text: String, spans: Seq[(String, String)], conll4: Boolean = true): String = {
    val lastTag = spans.toMap
    val order = spans.map(_._1).distinct
    order.foldLeft(text) { (acc, ne) =>
      val tag = lastTag(ne)
      val word = if (conll4) Parsers.MappingTagWords.getOrElse(tag, tag) else tag
      acc.replace(ne, s"<$word>$ne</$word>")
    }
  }
}
