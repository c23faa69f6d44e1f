package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, StringSim}

/** Entity linking: mention strings → catalogue entities, reproducing
  * `EntityMatching` exactly (ketl/mongo/entityMatching.py:29-94):
  * Jaro-Winkler top-k proposals, margin confidence `2*s1 − s2`
  * (`:87`), global min-max normalization (`:90-92`), and the 0.6
  * auto-accept threshold (`:22,199` — the human Excel loop replaced
  * by threshold accept per SURVEY §3.2).
  *
  * Scale design: the catalogue is the SMALL side → broadcast it once
  * and compute each mention's top-k in a single mapPartitions pass
  * (no shuffle, no M× row explosion — the Spark-native form of the
  * reference's full cross product). Before scoring, mentions are
  * deduplicated by string (`groupBy value` with provenance counts,
  * mirroring myMongoClient.py:62-75) — the hot-entity skew therefore
  * collapses into ONE scored row per distinct string, and the global
  * normalization is a 1-row aggregate joined back (the one
  * intentional barrier, SURVEY §7.3).
  *
  * For catalogues too big to broadcast, `candidateBlocks` gives the
  * blocking-key equi-join path of the north rule (normalized first
  * char + length band + char-bigram band keys).
  */
object EntityLinking {

  val NbPropositions = 4
  val ConfidenceThresh = 0.6

  /** Distinct mention strings (PERSON/ORG only — the linkable types)
    * with occurrence counts as provenance. */
  def valuesToMatch(mentions: Dataset[Mention]): Dataset[(String, Long)] = {
    import mentions.sparkSession.implicits._
    mentions
      .filter(m => m.tag == "PERSON" || m.tag == "ORG")
      .groupByKey(_.mention)
      .count()
  }

  /** Ranking order shared by every scoring path: score descending,
    * then ascending entity_id (deterministic; the reference inherits
    * pandas' stable sort order). */
  private val proposalOrder: Ordering[(Entity, Double)] =
    Ordering.by { case (e, s) => (-s, e.entity_id) }

  /** Broadcast top-k scoring: per distinct mention, Jaro-Winkler vs
    * every catalogue entity, keep NB_PROPOSITIONS best via a bounded
    * heap (one pass, O(k) space — never a full catalogue sort+copy
    * per mention). */
  def proposals(values: Dataset[(String, Long)], catalogue: Array[Entity]): Dataset[LinkProposal] = {
    val spark = values.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(catalogue.sortBy(_.entity_id))
    values.mapPartitions { it =>
      val ents = bc.value
      it.flatMap { case (mention, _) =>
        val top = graft.functions.TopK.smallest(
          ents.iterator.map(e => (e, StringSim.jaroWinkler(mention, e.display_name))),
          NbPropositions)(proposalOrder)
        top.zipWithIndex.map { case ((e, s), rank) =>
          LinkProposal(mention, e.entity_id, e.display_name, s, rank + 1)
        }
      }
    }
  }

  /** Margin confidence + global min-max normalization + accept
    * (entityMatching.py:82-94). Exact semantics:
    *   conf   = 1 if s1 == 1 else 2*s1 − s2
    *   min_   = min over ALL proposal scores (all ranks)
    *   max_   = max over confidences
    *   norm   = 1 if conf == 1 else (conf − min_)/(max_ + 0.05 − min_)
    *   accept = norm > 0.6 (top-1 proposal only)
    */
  def matches(props: Dataset[LinkProposal]): Dataset[LinkMatch] = {
    val spark = props.sparkSession
    import spark.implicits._

    val perMention = props
      .groupByKey(_.mention)
      .mapGroups { (mention, it) =>
        val ps = it.toSeq.sortBy(_.rank)
        val s1 = ps.head.jaro_score
        val s2 = if (ps.length > 1) ps(1).jaro_score else 0.0
        val conf = if (s1 == 1.0) 1.0 else 2 * s1 - s2
        (mention, ps.head.entity_id, ps.head.entity_name, s1, conf,
          ps.map(_.jaro_score).min)
      }
      .toDF("mention", "entity_id", "entity_name", "jaro_score", "raw_conf", "min_prop_score")

    // the intentional global barrier: 1-row aggregate, crossJoined back
    val stats = perMention.agg(
      min(col("min_prop_score")).as("min_"),
      max(col("raw_conf")).as("max_"))

    perMention.crossJoin(broadcast(stats))
      .withColumn("confidence",
        when(col("raw_conf") === 1.0, 1.0)
          .otherwise((col("raw_conf") - col("min_")) / (col("max_") + 0.05 - col("min_"))))
      .withColumn("accepted", col("confidence") > ConfidenceThresh)
      .select("mention", "entity_id", "entity_name", "jaro_score", "confidence", "accepted")
      .as[LinkMatch]
  }

  /** Distinct-mention count under which scoring + margin + global
    * normalization happen driver-side in one pass (the distributed
    * part — deduplicating the mention stream — still runs on the
    * cluster; only the ~|distinct|×|catalogue| scoring localizes,
    * mirroring the reference's own sequential loop exactly). */
  val LocalValuesThreshold: Int = 20000

  /** Full linking pass over a mention set: distributed dedup, then
    * adaptive scoring (driver-local below threshold — kills ~6 tiny
    * stages per run — identical math either way, spec-asserted). */
  def link(mentions: Dataset[Mention], catalogue: Array[Entity]): Dataset[LinkMatch] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val values = valuesToMatch(mentions)
    val head = values.map(_._1).limit(LocalValuesThreshold + 1).collect()
    if (head.length > LocalValuesThreshold)
      matches(proposals(values, catalogue))
    else
      spark.createDataset(linkLocal(head.toSeq, catalogue))
  }

  /** Catalogue size above which the collect+broadcast full-scan
    * scoring path is replaced by blocking-key candidate generation
    * ([[proposalsBlocked]]): a multi-million-entity catalogue neither
    * fits a broadcast nor affords O(|mentions|·|catalogue|) scoring.
    * Recall of the blocked path vs the exact path is spec-gated
    * (BlockedLinkingSpec, incl. a ×100 catalogue). */
  val BroadcastCatalogueThreshold: Long = 100000L

  /** Full linking against a catalogue DATASET, auto-selecting the
    * path by catalogue size the same way the local/distributed
    * scoring paths are gated: small → collect + broadcast (exact
    * reference semantics); large → blocked equi-join candidates +
    * identical margin/normalize/accept semantics downstream. */
  def linkAdaptive(mentions: Dataset[Mention], catalogue: Dataset[Entity],
                   forceBlocked: Boolean = false): Dataset[LinkMatch] = {
    if (!forceBlocked && catalogue.count() <= BroadcastCatalogueThreshold)
      link(mentions, catalogue.collect())
    else
      matches(proposalsBlocked(valuesToMatch(mentions), catalogue))
  }

  /** Array-catalogue overload (no extra count job — the size is known
    * driver-side); used by the pipeline. */
  def linkAdaptive(mentions: Dataset[Mention], catalogue: Array[Entity]): Dataset[LinkMatch] = {
    if (catalogue.length <= BroadcastCatalogueThreshold) link(mentions, catalogue)
    else {
      val spark = mentions.sparkSession
      import spark.implicits._
      matches(proposalsBlocked(valuesToMatch(mentions),
        spark.createDataset(catalogue.toIndexedSeq)))
    }
  }

  /** Driver-local scoring — literally the reference's control flow
    * (entityMatching.py:82-94) over the deduped mention strings. */
  def linkLocal(mentionStrings: Seq[String], catalogue: Array[Entity]): Seq[LinkMatch] = {
    // empty catalogue → no matches, like the distributed path (top.head
    // below would otherwise throw and make the two spec-equal paths
    // diverge: one crashes, one degrades)
    if (catalogue.isEmpty) return Seq.empty
    val ents = catalogue.sortBy(_.entity_id)
    val perMention = mentionStrings.sorted.map { mention =>
      val top = graft.functions.TopK.smallest(
        ents.iterator.map(e => (e, StringSim.jaroWinkler(mention, e.display_name))),
        NbPropositions)(proposalOrder)
      val s1 = top.head._2
      val s2 = if (top.length > 1) top(1)._2 else 0.0
      val conf = if (s1 == 1.0) 1.0 else 2 * s1 - s2
      (mention, top.head._1, s1, conf, top.map(_._2).min)
    }
    if (perMention.isEmpty) return Seq.empty
    val min_ = perMention.map(_._5).min
    val max_ = perMention.map(_._4).max
    perMention.map { case (mention, e, s1, conf, _) =>
      val norm = if (conf == 1.0) 1.0 else (conf - min_) / (max_ + 0.05 - min_)
      LinkMatch(mention, e.entity_id, e.display_name, s1, norm, norm > ConfidenceThresh)
    }
  }

  // ------------------------------------------------------------------
  // Human review loop (entityMatching.py:170-430): the styled Excel
  // workbook becomes a CSV sink of proposal rows; the filled-workbook
  // parser (process_excel_filled, :392-430) becomes a CSV source of
  // decisions folded back into the catalogue.
  // ------------------------------------------------------------------

  /** Proposal rows → review CSV (the workbook's Matches sheet,
    * entityMatching.py:170-389, minus styling): one row per
    * (mention, rank) candidate with the mention's provenance count.
    * Header on; deterministic order not required (the review tool
    * sorts). */
  def proposalsCsvSink(props: Dataset[LinkProposal], values: Dataset[(String, Long)],
                       path: String): Unit = {
    val spark = props.sparkSession
    import spark.implicits._
    val occ = values.toDF("mention", "n_occurrences")
    props.toDF()
      .join(broadcast(occ), Seq("mention"), "left_outer")
      .select("mention", "rank", "entity_id", "entity_name", "jaro_score", "n_occurrences")
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** One reviewed decision, as parsed back from the filled review file
    * (process_excel_filled output columns, entityMatching.py:427-430):
    * empty answer_id ⇒ the reviewer asked to CREATE a new entity named
    * `answer_name` (the can_create_entity branch); ignored mentions
    * simply have no row (the reference drops them before writing). */
  final case class ReviewDecision(
      value: String,
      answer_id: String, // nullable/empty → create new entity
      answer_name: String,
      entity_type: String)

  def readReviewCsv(spark: SparkSession, path: String): Dataset[ReviewDecision] = {
    import spark.implicits._
    spark.read.option("header", "true")
      .schema("value string, answer_id string, answer_name string, entity_type string")
      .csv(path)
      .na.fill("", Seq("answer_id"))
      .as[ReviewDecision]
  }

  /** Deterministic id for a reviewer-created entity (content-derived —
    * stable across reruns, unlike Mongo ObjectIds). */
  def newEntityId(name: String): String =
    f"N${Hashing.hash64("new-entity:" + name) & 0x7FFFFFFFFFFFFFFFL}%016x"

  /** Fold accepted review decisions back into the linking state
    * (the reference's accepted-matchings CSV → catalogue update):
    * create-entity decisions append new catalogue rows (deduped by
    * id); every decision becomes a human-confirmed LinkMatch
    * (confidence 1.0, accepted) against the resolved entity id —
    * ready to feed [[graft.kg.Canonicalize.canonicalMap]]. */
  def applyReview(decisions: Dataset[ReviewDecision],
                  catalogue: Dataset[Entity]): (Dataset[Entity], Dataset[LinkMatch]) = {
    val spark = decisions.sparkSession
    import spark.implicits._
    val created = decisions
      .filter(d => d.answer_id == null || d.answer_id.isEmpty)
      .map(d => Entity(newEntityId(d.answer_name), d.answer_name, d.entity_type))
      .dropDuplicates("entity_id")
    val updated = catalogue.unionByName(created).dropDuplicates("entity_id")
    val links = decisions.map { d =>
      val id = if (d.answer_id == null || d.answer_id.isEmpty) newEntityId(d.answer_name)
        else d.answer_id
      LinkMatch(d.value, id, d.answer_name, 1.0, 1.0, accepted = true)
    }
    (updated, links)
  }

  // ------------------------------------------------------------------
  // Blocking-key candidate generation (north rule) for catalogues too
  // large to broadcast: a mention and an entity are candidates iff
  // they share ≥1 block key. Keys: normalized first char, length band,
  // and the 2 smallest char-bigram hashes (cheap LSH-ish band).
  // ------------------------------------------------------------------

  def blockKeys(s: String): Seq[Long] = {
    val norm = s.toLowerCase.trim
    if (norm.isEmpty) return Seq(0L)
    val first = Hashing.hash64("f:" + norm.charAt(0))
    val lenBand = Hashing.hash64("l:" + (norm.length / 4))
    val bigrams = graft.functions.TextAnalytics.charNgrams(norm, 2)
      .map(g => Hashing.hash64("b:" + g)).sorted.take(2)
    (Seq(first, lenBand) ++ bigrams).distinct
  }

  /** Candidate pairs via exploded block keys + equi-join; dedup by
    * (mention, entity). The downstream scoring/top-k is shared with
    * the broadcast path. */
  def candidateBlocks(values: Dataset[(String, Long)], catalogue: Dataset[Entity]): Dataset[(String, Entity)] = {
    val spark = values.sparkSession
    import spark.implicits._
    val mentionKeys = values.flatMap { case (m, _) => blockKeys(m).map(k => (k, m)) }
      .toDF("bkey", "mention")
    val entityKeys = catalogue.flatMap(e => blockKeys(e.display_name).map(k => (k, e)))
      .toDF("bkey", "entity")
    mentionKeys.join(entityKeys, "bkey")
      .select(col("mention"), col("entity.entity_id"), col("entity.display_name"), col("entity.entity_type"))
      .distinct()
      .as[(String, String, String, String)]
      .map { case (m, id, name, tpe) => (m, Entity(id, name, tpe)) }
  }

  /** Blocked variant of proposals: same top-k semantics but only over
    * block-sharing candidates (recall < 1 by design; tested on the
    * fixture catalogue). */
  def proposalsBlocked(values: Dataset[(String, Long)], catalogue: Dataset[Entity]): Dataset[LinkProposal] = {
    val spark = values.sparkSession
    import spark.implicits._
    candidateBlocks(values, catalogue)
      .map { case (m, e) => (m, e.entity_id, e.display_name, StringSim.jaroWinkler(m, e.display_name)) }
      .toDF("mention", "entity_id", "entity_name", "jaro_score")
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("mention").orderBy(col("jaro_score").desc, col("entity_id"))))
      .filter(col("rank") <= NbPropositions)
      .as[LinkProposal]
  }
}
