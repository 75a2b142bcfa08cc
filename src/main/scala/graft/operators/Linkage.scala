package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution end-to-end: blocking → bounded-distance pairwise
  * match → connected components → survivorship. The record-linkage twin
  * of the dedup family — [[Joins.fuzzyLookup]] answers "which catalog
  * row is this probe", this answers "which rows ARE the same entity".
  */
object Linkage {

  /** Resolve duplicate records into entities.
    *
    * Stages (each individually scale-probed elsewhere in the repo):
    *  1. COLLAPSE exact duplicates: fuzzy matching runs over DISTINCT
    *     names only, each carrying `name_id` = its minimum record id.
    *     Real registries have power-law name multiplicity — a name
    *     appearing m times would otherwise contribute a C(m,2) clique
    *     of edit-distance-0 edges (probed here: the record-level
    *     variant built 5.5 M clique edges from 26.6 k records where the
    *     name level needs 64), so the collapse is what makes the pair
    *     stage tractable at all, exactly like `dedup_exact` ahead of
    *     MinHash in the curation pipeline.
    *  2. BLOCK on the name's first token — candidate pairs form only
    *     inside a block, never all-pairs (the same bound
    *     [[Joins.fuzzyLookup]] uses); a length band `|len(a)-len(b)| <=
    *     maxDist` prunes before the edit distance evaluates (levenshtein
    *     can never beat the length gap).
    *  3. MATCH name pairs at `levenshtein <= maxDist` — one equi-join on
    *     the block key, name_id_a < name_id_b so each pair is scored
    *     once.
    *  4. CLUSTER matched pairs with [[Dedup.clusters]] min-label CC;
    *     names with no match keep their own name_id (left join +
    *     coalesce). Labels are name_ids, and each name_id is the min
    *     record id under that name, so the component's label IS the
    *     entity's minimum record id — records inherit it through their
    *     name.
    *  5. SURVIVE: per entity, the member count and the canonical name =
    *     the minimum-id member's name (deterministic, engine-portable —
    *     production would rank by a quality score here, which
    *     [[Dedup.keepBestInCluster]] already demonstrates).
    *
    * Output: one row per entity `(entity_id, n_members,
    * canonical_name)`.
    */
  def resolveEntities(records: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "resolveEntities: maxDist must be >= 1")
    val r = records.select(col(idCol).cast("long").as("rid"),
      col(nameCol).as("name"))
    val names = r.groupBy(col("name")).agg(min(col("rid")).as("name_id"))
      .localCheckpoint(false) // two consumers: pair join (both sides) + final label join
    val block = (c: Column) => substring_index(c, " ", 1)
    val b = names.select(col("name_id"), col("name"),
      block(col("name")).as("__bk"))
    val pairs = b.as("a").join(b.as("b"),
        col("a.__bk") === col("b.__bk") &&
          col("a.name_id") < col("b.name_id") &&
          abs(length(col("a.name")) - length(col("b.name"))) <= maxDist)
      .where(levenshtein(col("a.name"), col("b.name")) <= maxDist)
      .select(col("a.name_id").as("doc_a"), col("b.name_id").as("doc_b"))
    val cc = Dedup.clusters(pairs)
      .select(col("doc_id").as("name_id"), col("cluster_id"))
    val nameEntity = names.join(cc, Seq("name_id"), "left")
      .select(col("name"),
        coalesce(col("cluster_id"), col("name_id")).as("entity_id"))
    r.join(nameEntity, Seq("name"))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        min(struct(col("rid"), col("name"))).as("__best"))
      .select(col("entity_id"), col("n_members"),
        col("__best.name").as("canonical_name"))
  }
}
