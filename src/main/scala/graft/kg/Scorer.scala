package graft.kg

import graft.functions.Hashing

/** Deterministic stand-in for the reference's per-row LLM calls
  * (SURVEY.md §2.8). The reference itself ships the precedent: the
  * `NoLLM` model returning a constant response
  * (llm/LLMModel.py:392-406). Ours is content-seeded: every response
  * is a pure function of (conv_id, turn_idx, text) — never of
  * partition id or row order — so outputs are bit-reproducible at any
  * parallelism.
  *
  * The scorer speaks the reference's own wire formats so the
  * extraction stages exercise the real parsers end-to-end:
  *  - mention detection answers in the `discussion` tuple-list format
  *    (pt_discussion.py:41-59);
  *  - relation extraction answers in the `filing` dict format
  *    (pt_filing.py:48-75), the two-stage chain shape of
  *    pt_multi_pt.py:81-90;
  *  - verification answers yes/no (verifier.py:26-31).
  *
  * A deterministic per-mille of turns get malformed (truncated)
  * responses to exercise the parsers' fallback-to-empty paths; these
  * are the recall cost the P/R≥0.95 gate budgets for (FIXTURES.md §5).
  *
  * Heavy lifting (the surface-form matcher) is built ONCE per
  * partition inside `mapPartitions` — the batching that replaces the
  * reference's sequential per-sentence loop (llm/LLMModel.py:87-91).
  */
object Scorer {

  /** Per-partition compiled matcher: surface forms in priority order
    * (longest-first, as supplied); greedy non-overlapping match with
    * word boundaries.
    *
    * Round-1 form scanned text.indexOf PER FORM — O(|forms|·|text|)
    * per turn, and with 540 surface forms that scan WAS the pipeline
    * wall (~8 s of the 9 s 5M-turn run). This form indexes forms by
    * their first word and probes only the words actually present in
    * the turn — O(|words|·avg-candidates). Semantics are identical:
    * candidates are claimed in (form priority, position) order, which
    * is exactly the order the per-form scan claimed them (spec-gated
    * against the naive algorithm on the full corpus). */
  final class Matcher(forms: IndexedSeq[(String, String, String)]) {
    // FNV hash of a word span — candidates are verified with
    // regionMatches, so hash collisions only cost a probe, never a
    // wrong match. Hashing in place avoids the per-word substring
    // allocation that made 32 concurrent task threads GC-bound.
    @inline private def wordHash(s: String, from: Int, until: Int): Long = {
      var h = 0xcbf29ce484222325L
      var i = from
      while (i < until) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
      h
    }

    // forms whose first char is not a letter/digit can never be found
    // by word-start probing — they keep the round-1 per-form indexOf
    // scan (zero such forms in the Lexicon; the class stays general)
    private val (indexableForms, scannedForms) = forms.zipWithIndex.partition {
      case ((surface, _, _), _) => surface.nonEmpty && surface.charAt(0).isLetterOrDigit
    }
    private val scanned: Array[(String, String, Int)] =
      scannedForms.collect { case ((surface, _, tag), prio) if surface.nonEmpty =>
        (surface, tag, prio)
      }.toArray

    // first-word hash of each surface → (surface, tag, priority)
    private val byFirstWord: scala.collection.mutable.LongMap[Array[(String, String, Int)]] = {
      val grouped = indexableForms
        .map { case ((surface, _, tag), prio) =>
          val w = surface.takeWhile(c => c.isLetterOrDigit)
          (wordHash(w, 0, w.length), surface, tag, prio)
        }
        .groupBy(_._1)
      val m = scala.collection.mutable.LongMap.empty[Array[(String, String, Int)]]
      grouped.foreach { case (k, xs) => m(k) = xs.map(x => (x._2, x._3, x._4)).toArray }
      m
    }

    def findMentions(text: String): List[(String, String)] = {
      if (text.isEmpty) return Nil
      val n = text.length
      // collect candidate occurrences at word starts (boundedLeft is
      // structural; boundedRight checked per candidate)
      val cands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String)]
      var i = 0
      while (i < n) {
        if (text.charAt(i).isLetterOrDigit &&
            (i == 0 || !text.charAt(i - 1).isLetterOrDigit)) {
          var j = i
          while (j < n && text.charAt(j).isLetterOrDigit) j += 1
          val hits = byFirstWord.getOrNull(wordHash(text, i, j))
          if (hits != null) {
            var h = 0
            while (h < hits.length) {
              val (surface, tag, prio) = hits(h)
              val end = i + surface.length
              if (end <= n && text.regionMatches(i, surface, 0, surface.length) &&
                  (end >= n || !text.charAt(end).isLetterOrDigit))
                cands += ((prio, i, surface, tag))
              h += 1
            }
          }
          i = j
        } else i += 1
      }
      // fallback scan for non-word-start forms (same candidate shape,
      // merged before the claim sort so ordering semantics are shared)
      var f = 0
      while (f < scanned.length) {
        val (surface, tag, prio) = scanned(f)
        var idx = text.indexOf(surface)
        while (idx >= 0) {
          val end = idx + surface.length
          if ((idx == 0 || !text.charAt(idx - 1).isLetterOrDigit) &&
              (end >= n || !text.charAt(end).isLetterOrDigit))
            cands += ((prio, idx, surface, tag))
          idx = text.indexOf(surface, idx + 1)
        }
        f += 1
      }
      // claim in (priority, position) order — the per-form scan's order
      val sorted = cands.sortBy(c => (c._1, c._2))
      val claimed = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      val found = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
      sorted.foreach { case (_, pos, surface, tag) =>
        val end = pos + surface.length
        if (!claimed.exists { case (s, e) => pos < e && s < end }) {
          claimed += ((pos, end))
          found += ((pos, surface, tag))
        }
      }
      found.sortBy(_._1).map { case (_, s, t) => (s, t) }.toList
    }
  }

  def newMatcher(): Matcher = new Matcher(Lexicon.surfaceForms)

  private def pyStr(s: String): String = graft.functions.Parsers.pyStr(s)

  private def noisy(convId: String, turnIdx: Int, text: String, salt: Long, perMille: Int, seed: Long): Boolean =
    Hashing.bucket(Hashing.hash64(s"$convId#$turnIdx#$text", seed ^ salt), 1000) < perMille

  /** Marker prefixing each few-shot example line inside a prompt
    * (Extraction.buildPromptsWithShots). */
  val ExampleMarker = "### EXAMPLE : "

  /** The example block of a prompt: everything before the input
    * sentinel, iff it carries example lines. Used by the scorer to
    * decide whether a mention was demonstrated — the INPUT text itself
    * must never count as its own demonstration. */
  def exampleBlockOf(prompt: String): String = {
    val cut = prompt.indexOf("<start_input>")
    val head = if (cut < 0) "" else prompt.substring(0, cut)
    if (head.contains(ExampleMarker)) head else ""
  }

  /** The deterministic stand-in's model-quality contract for few-shot
    * prompts: a would-be malformed generation is repaired when the
    * prompt's example block demonstrates one of the target surface
    * forms. This re-expresses the reference's measured few-shot gain
    * (+0.184 F1 from 0→3 sentence-kNN shots, results.ipynb cells 7/13;
    * prompt block pt_abstract.py:75-89) as content-pure plumbing:
    * no examples in the prompt → no gain. */
  private[kg] def demonstrated(mentions: Seq[(String, String)], examples: String): Boolean =
    examples.nonEmpty && mentions.exists { case (ne, _) => examples.contains(ne) }

  /** Mention-detection response in discussion tuple-list format. */
  def mentionResponse(m: Matcher, convId: String, turnIdx: Int, text: String,
                      cfg: TranscriptGen.Config, examples: String = ""): String = {
    val mentions = m.findMentions(text)
    val body = mentions.map { case (ne, tag) => s"(${pyStr(ne)}, ${pyStr(tag)})" }.mkString("[", ", ", "]")
    if (noisy(convId, turnIdx, text, 0x1001, cfg.scorerNoisePerMille, cfg.seed) &&
        !demonstrated(mentions, examples)) {
      // truncated mid-list: the discussion parser finds no closer → []
      val full = s"Sure, here are the entities: $body"
      full.substring(0, math.max(10, full.length / 2)).stripSuffix(")]")
    } else {
      s"The named entities are: $body <end_output>"
    }
  }

  val RelationPreds: Set[String] = Set("works_for", "visited", "located_in", "met", "acquired")

  /** Relation response in filing dict format, derived from the turn
    * text plus the stage-1 mention list (two-stage chain). Values are
    * "subj -> obj" strings the relation parser splits. */
  def relationResponse(convId: String, turnIdx: Int, text: String,
                       mentions: Seq[(String, String)], cfg: TranscriptGen.Config): String = {
    val persons = mentions.filter(_._2 == "PERSON").map(_._1)
    val orgs = mentions.filter(_._2 == "ORG").map(_._1)
    val gpes = mentions.filter(_._2 == "GPE").map(_._1)
    val rels = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    if (text.contains(" from ") && text.contains(" visited ")) {
      for (p <- persons.headOption; o <- orgs.headOption) rels += (("works_for", p, o))
      for (p <- persons.headOption; l <- gpes.headOption) rels += (("visited", p, l))
    }
    if (text.contains("opened a new office in"))
      for (o <- orgs.headOption; l <- gpes.headOption) rels += (("located_in", o, l))
    if (text.contains(" met ") && persons.length >= 2)
      rels += (("met", persons(0), persons(1)))
    if (text.contains(" joined "))
      for (p <- persons.headOption; o <- orgs.headOption) rels += (("works_for", p, o))
    if (text.contains(" acquired ") && orgs.length >= 2)
      rels += (("acquired", orgs(0), orgs(1)))

    val byPred = rels.groupBy(_._1).toSeq.sortBy(_._1)
    val body = byPred.map { case (pred, rs) =>
      s"${pyStr(pred)}: [" + rs.map(r => pyStr(s"${r._2} -> ${r._3}")).mkString(", ") + "]"
    }.mkString("{", ", ", "}")
    if (noisy(convId, turnIdx, text, 0x2002, cfg.scorerNoisePerMille, cfg.seed))
      s"{'maybe': " // malformed → {}
    else
      s"$body <end_output>"
  }

  /** Confidence-checker response (confidence_checker.py:7-17): one
    * json dict of mention → level per turn; a deterministic per-mille
    * of mentions are omitted from the dict (the reference's missing-
    * key → 'None' path). Levels derive from the mention hash. */
  def confidenceResponse(convId: String, turnIdx: Int, text: String,
                         spans: Seq[(String, String)], cfg: TranscriptGen.Config): String = {
    val levels = Vector("low", "medium-low", "medium", "medium-high", "high")
    val entries = spans.flatMap { case (ne, tag) =>
      val h = Hashing.hash64(s"$convId#$turnIdx#$ne/$tag", cfg.seed ^ 0x4004)
      if (Hashing.bucket(h, 1000) < cfg.verifierNoisePerMille) None // omitted key
      else Some(s"${pyStr(ne)}: ${pyStr(levels(3 + Hashing.bucket(h, 2)))}") // medium-high/high for real mentions
    }
    entries.mkString("{", ", ", "} <end_output>")
  }

  /** Candidate tag vocabulary for per-mention logits, fixed order. */
  val TagVocab: Vector[String] = Extraction.MentionTags.toVector.sorted

  /** Deterministic per-tag logits for one extracted mention — the
    * engine's stand-in for llama.cpp's eval_logits
    * (evaluating_confidence.py:59-60, get_logits_for_tags :56-77):
    * one logit per TagVocab entry from content hash, the "generated"
    * tag's logit boosted. A deterministic per-mille of mentions put
    * the boost on a WRONG tag with a weaker margin — so the
    * downstream confidence→ROC/AUC analysis has both classes and the
    * confidence actually separates them (the property the reference
    * studies). Returns (outputted_tag, logits). */
  def tagLogits(convId: String, turnIdx: Int, mention: String, tag: String,
                cfg: TranscriptGen.Config): (String, Array[Double]) = {
    val base = Hashing.hash64(s"$convId#$turnIdx#$mention/$tag", cfg.seed ^ 0x5005)
    val logits = Array.tabulate(TagVocab.length) { i =>
      Hashing.toUnit(Hashing.hash64(base, 11L + i)) * 4 - 2 // stable noise in [-2, 2)
    }
    val wrong = Hashing.bucket(Hashing.mix64(base), 1000) < cfg.logitNoisePerMille
    val ti = math.max(0, TagVocab.indexOf(tag))
    val oi = if (wrong) (ti + 1 + Hashing.bucket(base, TagVocab.length - 1)) % TagVocab.length else ti
    // the generated tag's logit sits `margin` above the runner-up —
    // weaker margins on wrong picks is what makes softmax confidence
    // SEPARATE correct from wrong (the reference's ROC finding)
    val margin =
      if (wrong) 0.2 + Hashing.toUnit(Hashing.hash64(base, 7L)) * 1.5
      else 1.5 + Hashing.toUnit(Hashing.hash64(base, 7L)) * 2.0
    logits(oi) = logits.max + margin
    (TagVocab(oi), logits)
  }

  /** Verifier response: yes unless content-hash noise says no. */
  def verifierResponse(convId: String, turnIdx: Int, mention: String, tag: String, text: String,
                       cfg: TranscriptGen.Config): String = {
    val reallyThere = text.contains(mention)
    val flip = noisy(convId, turnIdx, s"$mention/$tag", 0x3003, cfg.verifierNoisePerMille, cfg.seed)
    if (reallyThere != flip) "Yes, it is a valid entity. <end_answer>"
    else "No. <end_answer>"
  }
}
