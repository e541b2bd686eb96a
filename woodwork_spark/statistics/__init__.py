"""Statistics subpackage.

Shared percentile-engine switch for the profiling stack: every
quartile/bound the describe / box-plot / medcouple family computes goes
through :func:`profile_percentile`, which honors the
``profile_percentile_mode`` config option — "exact" (default, Spark
``percentile``: pandas linear interpolation, reference parity) or
"approx" (``percentile_approx``: KLL-style sketch with bounded
aggregation state, the 100 TB path — exact percentile's state is a map
of every distinct value, which is the one unbounded-state aggregate in
the headline ``describe()`` path on high-cardinality doubles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from woodwork_spark.config import config


def profile_percentile(col, fractions):
    """Percentile aggregate for profiling code paths.

    ``fractions`` may be a float or a list of floats; returns a
    ``double`` / ``array<double>`` column either way (the approx
    variant natively returns the INPUT type — an observed value, no
    interpolation — so it is cast for schema stability).  Accuracy of
    the approx sketch is pinned by ``profile_approx_accuracy``
    (rank error <= 1/accuracy).
    """
    mode = config.get_option("profile_percentile_mode")
    if mode == "exact":
        return F.percentile(col, F.lit(fractions))
    if mode != "approx":
        raise ValueError(
            "profile_percentile_mode must be 'exact' or 'approx', "
            f"got {mode!r}",
        )
    acc = int(config.get_option("profile_approx_accuracy"))
    out = F.percentile_approx(col, F.lit(fractions), F.lit(acc))
    if isinstance(fractions, (list, tuple)):
        return out.cast("array<double>")
    return out.cast("double")
