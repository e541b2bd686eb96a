"""Global configuration for woodwork_spark.

Semantics mirror the reference's config surface
(/root/reference/woodwork/config.py:6-118): same option names, same
defaults, context-manager override. Values are behavioral constants the
rebuild must preserve (BASELINE.md "parity defaults").
"""

from __future__ import annotations

import contextlib

# String vocabulary treated as missing values when normalizing raw string
# columns (reference config.py:25-51).  The None/NaN/NaT entries of the
# reference are irrelevant here: Spark nulls are already null.
NAN_STRING_VALUES = [
    "",
    " ",
    "None",
    "NONE",
    "none",
    "NULL",
    "Null",
    "null",
    "NAN",
    "NaN",
    "Nan",
    "nan",
    "NA",
    "na",
    "N/A",
    "n/a",
    "n/A",
    "N/a",
    "<NA>",
    "<N/A>",
    "<n/a>",
    "<na>",
]

CONFIG_DEFAULTS = {
    "categorical_threshold": 0.2,
    "numeric_categorical_threshold": None,
    "email_inference_regex": r"^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+$",
    "url_inference_regex": r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+",
    "ipv4_inference_regex": r"^(([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\.){3}([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])$",
    "ipv6_inference_regex": (
        r"(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:"
        r"|([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}"
        r"|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}"
        r"|([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}"
        r"|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}"
        r"|([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}"
        r"|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})"
        r"|:((:[0-9a-fA-F]{1,4}){1,7}|:)"
        r"|fe80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}"
        r"|::(ffff(:0{1,4}){0,1}:){0,1}((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}"
        r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])"
        r"|([0-9a-fA-F]{1,4}:){1,4}:((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}"
        r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]))"
    ),
    "phone_inference_regex": r"^(?:\+?(0{2})?1[-.\s]?)?\(?([2-9][0-9]{2})\)?[-\.\s]?([2-9][0-9]{2})[-\.\s]?([0-9]{4})$",
    "postal_code_inference_regex": r"^[0-9]{5}(?:-[0-9]{4})?$",
    "nan_values": list(NAN_STRING_VALUES),
    "frequence_inference_window_length": 15,
    "frequence_inference_threshold": 0.9,
    "correlation_metrics": ["mutual_info", "pearson", "spearman", "max", "all"],
    "medcouple_threshold": 0.3,
    "medcouple_sample_size": 10000,
    "boolean_inference_strings": [
        frozenset(["yes", "no"]),
        frozenset(["y", "n"]),
        frozenset(["true", "false"]),
        frozenset(["t", "f"]),
    ],
    "boolean_transform_mappings": {
        "yes": True,
        "no": False,
        "y": True,
        "n": False,
        "true": True,
        "false": False,
        "t": True,
        "f": False,
    },
    "boolean_inference_ints": set(),
    # woodwork_spark additions (distributed-execution knobs; not in reference)
    "inference_sample_size": 100_000,
    "frequency_inference_collect_limit": 2_000_000,
    # Percentile engine for the profiling stack (describe / box plot /
    # medcouple bounds).  "exact" (default) is Spark `percentile` —
    # pandas linear interpolation, required for reference parity — but
    # its aggregation state holds every distinct value, the one
    # unbounded-state aggregate left in the headline describe() path at
    # 100 TB of high-cardinality doubles.  "approx" routes the same
    # quartiles through `percentile_approx` (KLL-style sketch, bounded
    # state of ~`profile_approx_accuracy` entries per column) — rank
    # error <= 1/accuracy, no interpolation (returns an observed value).
    "profile_percentile_mode": "exact",
    "profile_approx_accuracy": 10_000,
}


class Config:
    """Key-value config with defaults, reset, and scoped override."""

    def __init__(self, default_values):
        self._defaults = {k: v for k, v in default_values.items()}
        self._data = {k: v for k, v in default_values.items()}

    def set_option(self, key, value):
        if key not in self._data:
            raise KeyError(f"Invalid option specified: {key}")
        self._data[key] = value

    def get_option(self, key):
        if key not in self._data:
            raise KeyError(f"Invalid option specified: {key}")
        return self._data[key]

    def reset_option(self, key):
        if key not in self._data:
            raise KeyError(f"Invalid option specified: {key}")
        self._data[key] = self._defaults[key]

    @contextlib.contextmanager
    def with_options(self, **options):
        previous = {k: self.get_option(k) for k in options}
        for k, v in options.items():
            self.set_option(k, v)
        try:
            yield
        finally:
            for k, v in previous.items():
                self.set_option(k, v)

    def __repr__(self):
        header = "woodwork_spark Global Config Settings"
        lines = [header, "-" * len(header)]
        lines += [f"{k}: {v}" for k, v in self._data.items()]
        return "\n".join(lines)


config = Config(CONFIG_DEFAULTS)
