"""Fetch simulation: frontier row -> payload row.

The reference fetches with Playwright (+ FlareSolverr on Cloudflare
challenges, cloudflare/handler.py:39-69,360-397, spiders/crunchy.py:129-169).
Here "fetching" a URL resolves to an image+caption payload row
(BASELINE.json input_hint) joined from the `images` table; the Cloudflare
challenge/solve path is a deterministic per-URL predicate so retries and
deferrals are replayable.

Scale note: `bytes` is the heavy column — the join keeps it out of any
shuffle wider than the fetch itself (images is pre-bucketable by
image_id; selected-side is small relative to the frontier), and parse
drops it immediately after decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic challenge simulation knobs. solve-fail is a subset of
# challenge (sha%100==0 => sha%10==0) so the retry path actually fires.
CHALLENGE_MOD = 10  # pmod(sha,10)==0 on cloudflare hosts -> challenge page
SOLVE_FAIL_MOD = 100  # pmod(sha,100)==0 -> FlareSolverr solve fails


def fetch_payloads(
    selected: DataFrame,
    images: DataFrame,
    page_meta: DataFrame,
    max_attempts: int = 3,
) -> DataFrame:
    """Join selected frontier rows to payloads and classify the outcome.

    Output adds: fetch_status in (fetched|deferred|failed), plus payload
    and page-content columns. `deferred` = challenge solve failed and
    attempts remain (reference: nack+requeue, pipelines.py:184-201,
    spiders/crunchy.py:114-127,166-169); attempts exhausted -> failed.
    """
    challenge = F.coalesce(F.col("cloudflare"), F.lit(False)) & (
        F.pmod(F.col("sha_int"), F.lit(CHALLENGE_MOD)) == 0
    )
    solve_fail = challenge & (F.pmod(F.col("sha_int"), F.lit(SOLVE_FAIL_MOD)) == 0)
    out = (
        selected.join(images, "image_id", "left")
        .join(page_meta, "image_id", "left")
        .withColumn("_challenge", challenge)
        .withColumn("_solve_fail", solve_fail)
        .withColumn(
            "fetch_status",
            F.when(F.col("bytes").isNull(), F.lit("failed"))
            .when(
                F.col("_solve_fail") & (F.col("attempt") + 1 < F.lit(max_attempts)),
                F.lit("deferred"),
            )
            .when(F.col("_solve_fail"), F.lit("failed"))
            .otherwise(F.lit("fetched")),
        )
        .withColumn(
            "fetch_reason",
            F.when(F.col("_solve_fail"), F.lit("cloudflare_solve_failed"))
            .when(F.col("_challenge"), F.lit("cloudflare_solved"))
            .otherwise(F.lit(None).cast("string")),
        )
        .drop("_challenge", "_solve_fail")
    )
    return out
