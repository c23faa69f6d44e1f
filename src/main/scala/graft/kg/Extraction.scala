package graft.kg

import org.apache.spark.sql.Dataset
import graft.functions.{Parsers, TextAnalytics}

/** Mention + relation extraction stages (SURVEY.md §7.0 steps 1-4).
  * Each stage is a declarative Dataset transform; the only imperative
  * code is inside `mapPartitions` batches where the scorer lives.
  * All stages carry (conv_id, turn_idx) so the stable turn ordering
  * of the north rule is a key property, not an accident of plan
  * order.
  */
object Extraction {

  /** Prompt building + the oversized-prompt drop. The reference skips
    * prompts over the context budget (pt_abstract.py:54-60) — an
    * important drop semantic; dropped rows are COUNTED by the caller
    * via the returned datasets, not silently lost. Also applies the
    * brace filter the reference bakes into dataset cleaning
    * (Conll2003Dataset.py:62-63) and drops empty texts. */
  def buildPrompts(turns: Dataset[Turn]): Dataset[Prompt] = {
    import turns.sparkSession.implicits._
    turns
      .filter(t => t.text.nonEmpty && !t.text.contains("{"))
      .map { t =>
        val prompt = s"### SYSTEM : The task is to extract named entities in a sentence.\n" +
          s"### USER : <start_input> ${t.text} <end_input>\n### ASSISTANT : <start_output> ["
        Prompt(t.conv_id, t.turn_idx, t.text, prompt, TextAnalytics.tokenCountWs(prompt))
      }
      .filter(_.prompt_tokens <= TranscriptGen.MaxPromptTokens)
  }

  /** Batched mention scorer: matcher built once per partition
    * (replaces the reference's per-sentence model invocation,
    * llm/LLMModel.py:87-91). */
  def scoreMentions(prompts: Dataset[Prompt], cfg: TranscriptGen.Config): Dataset[Scored] = {
    import prompts.sparkSession.implicits._
    prompts.mapPartitions { it =>
      val matcher = Scorer.newMatcher() // per-partition "model load"
      it.map { p =>
        Scored(p.conv_id, p.turn_idx, p.text,
          Scorer.mentionResponse(matcher, p.conv_id, p.turn_idx, p.text, cfg))
      }
    }
  }

  /** Parse the discussion-format responses into mention rows
    * (pt_discussion.py:41-59 semantics, tag filter included). */
  val MentionTags: Set[String] = Set("PERSON", "ORG", "GPE")

  def parseMentions(scored: Dataset[Scored]): Dataset[Mention] = {
    import scored.sparkSession.implicits._
    scored.flatMap { s =>
      Parsers.parseTupleList(s.response, MentionTags)
        .map { case (ne, tag) => Mention(s.conv_id, s.turn_idx, ne, tag) }
    }
  }

  /** Two-stage chain (pt_multi_pt.py:81-90 shape): stage-1 mentions
    * grouped back per turn feed the relation scorer; responses are
    * filing-format dicts parsed and split into (subj, pred, obj). */
  def extractRelations(scored: Dataset[Scored], mentions: Dataset[Mention],
                       cfg: TranscriptGen.Config): Dataset[Relation] = {
    val spark = scored.sparkSession
    import spark.implicits._
    val mentionsByTurn = mentions
      .groupByKey(m => (m.conv_id, m.turn_idx))
      .mapGroups { (key: (String, Int), it: Iterator[Mention]) =>
        // canonical order: first occurrence order is lost after shuffle,
        // so sort by (mention, tag) — deterministic under any parallelism
        (key._1, key._2, it.map(m => (m.mention, m.tag)).toSeq.sortBy(identity))
      }
      .toDF("conv_id", "turn_idx", "mset")
      .as[(String, Int, Seq[(String, String)])]

    scored
      .joinWith(mentionsByTurn,
        scored("conv_id") === mentionsByTurn("conv_id") &&
          scored("turn_idx") === mentionsByTurn("turn_idx"),
        "inner")
      .mapPartitions { it =>
        it.flatMap { case (s, (c, t, mset)) =>
          // re-establish in-text order for the rule positions
          val ordered = mset.sortBy { case (m, _) => val i = s.text.indexOf(m); if (i < 0) Int.MaxValue else i }
          val resp = Scorer.relationResponse(c, t, s.text, ordered, cfg)
          Parsers.parseFilingJson(resp, Scorer.RelationPreds).flatMap { case (pair, pred) =>
            val arrow = pair.indexOf(" -> ")
            if (arrow < 0) Nil
            else List(Relation(c, t, pair.substring(0, arrow), pred, pair.substring(arrow + 4)))
          }
        }
      }
  }

  /** Verification pass (verifier.py:11-32): one yes/no scorer call
    * per extracted mention; keep iff "yes". A second batched
    * mapPartitions over the exploded mention rows. */
  def verifyMentions(mentions: Dataset[Mention], turns: Dataset[Turn],
                     cfg: TranscriptGen.Config): Dataset[Mention] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val withText = mentions.joinWith(turns,
      mentions("conv_id") === turns("conv_id") && mentions("turn_idx") === turns("turn_idx"),
      "inner")
    withText.mapPartitions { it =>
      it.flatMap { case (m, t) =>
        val resp = Scorer.verifierResponse(m.conv_id, m.turn_idx, m.mention, m.tag, t.text, cfg)
        Parsers.verifierAnswer(resp) match {
          case Some(true) => Some(m)
          case _ => None
        }
      }
    }
  }
}
