package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X205 — Merkle content addressing of a corpus release: per-doc
  * leaf digests md5(id ‖ ':' ‖ md5(content)) fold into per-group
  * roots (md5 of the leaf list in id order), and the group roots
  * fold into one corpus root — so "did anything change between these
  * two releases" is ONE string compare, and a changed group is
  * pinpointed by comparing \|groups\| roots, not by re-reading data.
  * Complements X105's export manifest (sizes/counts) with
  * content-level identity, and X51's snapshot diff (which finds the
  * ROWS once a root mismatch says where to look).
  *
  * Scale note: this is a two-level tree (docs → group → corpus). At
  * 100 TB a group's collect_list is the bound — shard groups into
  * sub-roots (md5 over id-range buckets, then fold bucket roots)
  * to keep every list bounded; the fold shape is identical.
  */
object Provenance {

  def merkleRoots(docs: DataFrame, groupCol: String, idCol: String,
      contentCol: String): DataFrame = {
    val leaves = docs.select(col(groupCol).as("grp"), col(idCol),
      md5(concat_ws(":", col(idCol),
        md5(col(contentCol).cast("string")))).as("__leaf"))
    val groups = leaves.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws(",", transform(
          sort_array(collect_list(struct(col(idCol).as("i"),
            col("__leaf").as("l")))),
          x => x.getField("l")))).as("root"))
    val corpus = groups
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        md5(concat_ws(",", transform(
          sort_array(collect_list(struct(col("grp").as("g"),
            col("root").as("r")))),
          x => x.getField("r")))).as("root"))
      .select(lit("(corpus)").as("grp"), col("n_docs"), col("root"))
    groups.select(col("grp"), col("n_docs").cast("long").as("n_docs"),
        col("root"))
      .unionByName(corpus)
  }
}
