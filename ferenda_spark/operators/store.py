"""Document-store semantics: versioned archive + patching.

* :func:`current_versions` — W2 "current vs archived" resolution
  (list_versions/archive, documentstore.py:462-512, 605-637): latest
  row per key wins; older rows are the archive.
* :func:`next_archive_version` — W4 next version id =
  count(existing versions) (get_archive_version,
  documentrepository.py:605-621).
* :func:`apply_patches` — P7 patch-before-parse (patch_if_needed,
  documentrepository.py:1277-1326).  The reference applies unified
  diffs per document; the Spark restatement broadcast-joins a small
  (key, find, replace) patch dimension and rewrites the text column —
  patches are corrections curated by hand, so the dimension is always
  broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def current_versions(df: DataFrame, key_col: str, ts_col: str,
                     tiebreak: str | None = None) -> DataFrame:
    """Add (version_rank, is_current): rank 1 = newest per key."""
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return (df.withColumn("version_rank", F.row_number().over(w))
            .withColumn("is_current", F.col("version_rank") == 1))


def next_archive_version(df: DataFrame, key_col: str) -> DataFrame:
    """(key, next_version): id the next archived copy would get."""
    return (df.groupBy(key_col)
            .agg(F.count("*").alias("n_versions"))
            .withColumn("next_version", F.col("n_versions") + 1))


def apply_patches(df: DataFrame, patches: DataFrame, key_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """Broadcast-join the patch dimension and apply (find -> replace)
    to the text column; unpatched rows pass through.  Adds `patched`
    bool (the reference logs a patchdescription the same way).

    Patches are aggregated to ONE array per key before the join — the
    reference applies a single unified diff per document, so multiple
    patch rows compose (applied in sorted (find, replace) order, a
    deterministic fold) instead of silently duplicating the document
    row once per patch."""
    p = F.broadcast(
        patches.groupBy(F.col(key_col).alias("_pk"))
        .agg(F.array_sort(F.collect_list(F.struct("find", "replace")))
             .alias("_patches")))
    joined = df.join(p, df[key_col] == F.col("_pk"), "left")
    patched_text = F.when(
        F.col("_patches").isNotNull(),
        F.aggregate("_patches", F.col(text_col),
                    lambda acc, pt: F.replace(acc, pt["find"],
                                              pt["replace"]))
    ).otherwise(F.col(text_col))
    return (joined
            .withColumn(text_col, patched_text)
            .withColumn("patched", F.col("_patches").isNotNull())
            .drop("_pk", "_patches"))
