"""Schema-preserving serialization.

Reference: table_accessor.py:654-697, serializers/serializer_base.py:24-186,
deserialize.py:1-66.

Two complementary channels:
1. parquet/orc: per-column typing info rides inside
   ``StructField.metadata["ww"]`` — Spark embeds its full StructType
   (including metadata) in the file footer, so a plain
   ``spark.read.parquet`` round-trips it with zero extra I/O.
2. every format: a ``woodwork_typing_info.json`` sidecar (the reference's
   typing-info dict, schema_version 12.0.0) written next to the data —
   covers csv/json and preserves table-level name/index/metadata.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from woodwork_spark.schema import SCHEMA_VERSION, TableSchema

TYPING_INFO_FILENAME = "woodwork_typing_info.json"


def _join(path: str, child: str) -> str:
    """Scheme-safe path join: works for local paths and for
    s3a://, hdfs://, file:// URIs alike (os.path.join would not)."""
    return path.rstrip("/") + "/" + child


def _fs_for(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for any URI scheme Spark can reach.

    The reference reaches S3 through tar+smart_open
    (table_accessor.py:654-697); on Spark the cluster's Hadoop FS layer
    already speaks every configured scheme, so the typing-info sidecar
    goes through it too — at 100 TB nothing is local."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _write_text(spark: SparkSession, path: str, text: str):
    fs, hpath = _fs_for(spark, path)
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def _read_text(spark: SparkSession, path: str):
    """Contents of ``path`` as str, or None if it does not exist."""
    fs, hpath = _fs_for(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_for(spark, path)
    return bool(fs.exists(hpath))


FORMATS = ("csv", "parquet", "orc", "json", "feather", "arrow")


def _local_path(path: str) -> str:
    """Driver-local filesystem path for single-file formats, or a clear
    error: feather/arrow are interchange files written by the driver
    (reference feather_serializer.py writes one file via to_feather) —
    cluster URIs need a cluster format (parquet/orc)."""
    if "://" not in path:
        return path
    if path.startswith("file://"):
        return path[len("file://"):]
    raise ValueError(
        f"feather/arrow write a single driver-local file; got '{path}'. "
        "Use format='parquet' or 'orc' for cluster filesystems.",
    )


def to_disk(ww_df, path, format="parquet", mode="overwrite", **options):
    """Write data + typing info.  ``path`` becomes a directory containing
    the data under ``data/`` and the typing-info JSON.  Any Hadoop-FS URI
    scheme works for the cluster formats (file://, hdfs://, s3a://...).

    Formats (reference serializers/utils.py:10-28): csv/parquet/orc/json
    are distributed Spark writes; feather/arrow are single-file Arrow IPC
    interchange written by the driver — meant for pandas-sized results
    and migration back to the pandas reference, NOT cluster-scale
    outputs.  'pickle' (a pandas in-memory format) is refused explicitly:
    there is no distributed pickle, use parquet/orc instead."""
    fmt = format.lower()
    if fmt == "pickle":
        raise ValueError(
            "format='pickle' serializes a single in-memory pandas object "
            "(reference pickle_serializer.py) and has no distributed "
            "equivalent. Use format='parquet' or 'orc' for Spark-native "
            "round trips, or 'feather'/'arrow' for single-file pandas "
            "interchange.",
        )
    if fmt not in FORMATS:
        raise ValueError(
            "must be one of the following formats: "
            + ", ".join(FORMATS) + ", pickle",
        )
    data_path = _join(path, "data")
    df = ww_df.df  # metadata-embedded
    location = "data"
    if fmt in ("feather", "arrow"):
        import os

        from pyarrow import feather

        local = _local_path(path)
        os.makedirs(os.path.join(local, "data"), exist_ok=True)
        filename = f"data.{fmt}"
        # toArrow (Spark 4) keeps structs/arrays exact; feather v2 IS the
        # Arrow IPC file format, so one writer serves both spellings
        feather.write_feather(
            df.toArrow(), os.path.join(local, "data", filename), **options,
        )
        location = f"data/{filename}"
    else:
        writer = df.write.mode(mode)
        if fmt == "csv":
            writer = writer.option("header", "true")
            for k, v in options.items():
                writer = writer.option(k, v)
            writer.csv(data_path)
        elif fmt == "parquet":
            writer.parquet(data_path)
        elif fmt == "orc":
            writer.orc(data_path)
        elif fmt == "json":
            writer.json(data_path)
    info = ww_df.to_dictionary()
    info["loading_info"] = {
        "table_type": "spark",
        "location": location,
        "type": fmt,
    }
    _write_text(
        df.sparkSession,
        _join(path, TYPING_INFO_FILENAME),
        json.dumps(info, indent=2, default=str),
    )
    return path


def from_disk(spark: SparkSession, path, validate=True):
    """Read data + typing info back into a WWDataFrame
    (reference read_woodwork_table deserialize.py:1-66)."""
    from woodwork_spark.accessor import init_with_full_schema
    from woodwork_spark.io import read_parquet

    info_text = _read_text(spark, _join(path, TYPING_INFO_FILENAME))
    info = None
    if info_text is not None:
        info = json.loads(info_text)
        version = info.get("schema_version", SCHEMA_VERSION)
        supported = tuple(int(x) for x in SCHEMA_VERSION.split("."))
        if tuple(int(x) for x in version.split(".")) > supported:
            import warnings

            from woodwork_spark.exceptions import UpgradeSchemaWarning

            warnings.warn(
                f"The schema version of the saved woodwork table {version} "
                f"is greater than the latest supported {SCHEMA_VERSION}",
                UpgradeSchemaWarning,
            )
        fmt = info.get("loading_info", {}).get("type", "parquet")
        data_path = _join(path, info.get("loading_info", {}).get("location", "data"))
    else:
        fmt = "parquet"
        data_path = _join(path, "data")
        if not _exists(spark, data_path):
            data_path = path

    if fmt == "parquet":
        df = read_parquet(spark, data_path)
    elif fmt == "orc":
        df = spark.read.orc(data_path)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(data_path)
    elif fmt == "json":
        df = spark.read.json(data_path)
    elif fmt in ("feather", "arrow"):
        import glob
        import os

        from pyarrow import feather

        local = _local_path(data_path)
        if os.path.isdir(local):
            files = sorted(
                f
                for ext in ("feather", "arrow")
                for f in glob.glob(os.path.join(local, f"*.{ext}"))
            )
            if not files:
                raise ValueError(f"no feather/arrow file under {local}")
            local = files[0]
        from woodwork_spark.io import pandas_to_spark

        # pinned-Arrow conversion: NaN -> NULL identically under any
        # session conf (see io.pandas_to_spark)
        df = pandas_to_spark(spark, feather.read_table(local).to_pandas())
    else:
        raise ValueError(f"could not determine format: {fmt}")

    if info is not None:
        schema = TableSchema.from_dictionary(info)
        if fmt in ("csv", "json", "feather", "arrow"):
            # csv/json lose physical types; feather/arrow carry pandas
            # dtypes that may drift from Spark's — re-coerce through the
            # logical-type transforms either way
            return _coerced_init(df, schema)
        return init_with_full_schema(df, schema, validate=validate)

    # no sidecar: rebuild from StructField metadata (parquet channel)
    schema = TableSchema.from_struct(df.schema)
    if schema is None:
        # migration path: a parquet written by the pandas reference keys
        # its typing info as a `ww_meta` blob in the file footer
        # (reference parquet_serializer.py:53-69) — neither a sidecar
        # nor StructField metadata exists there
        meta_info = _read_ww_meta(data_path)
        if meta_info is not None:
            return _coerced_init(df, TableSchema.from_dictionary(meta_info))
        from woodwork_spark.accessor import init

        return init(df, validate=False)
    return init_with_full_schema(df, schema, validate=validate)


def _coerced_init(df, schema: TableSchema):
    """init with the saved logical types (physical re-coercion through
    transforms) + restore per-column schema attributes."""
    from woodwork_spark.accessor import init

    lt_map = {name: cs.logical_type for name, cs in schema.columns.items()}
    out = init(
        df,
        name=schema.name,
        logical_types=lt_map,
        table_metadata=schema.metadata,
        validate=False,
    )
    for name, cs in schema.columns.items():
        out.schema.columns[name].semantic_tags = set(cs.semantic_tags)
        out.schema.columns[name].description = cs.description
        out.schema.columns[name].origin = cs.origin
        out.schema.columns[name].metadata = cs.metadata
        out.schema.columns[name].use_standard_tags = cs.use_standard_tags
    return out


def _read_ww_meta(data_path: str):
    """Best-effort read of the reference's ``ww_meta`` parquet-footer
    typing blob.  Reference archives are single local files written by
    pyarrow (parquet_serializer.py:53-69), so this probes the local
    filesystem only; cluster-written tables use the sidecar or
    StructField channels instead."""
    import glob
    import os

    path = data_path
    if path.startswith("file://"):
        path = path[len("file://"):]
    elif "://" in path:
        return None
    if os.path.isdir(path):
        candidates = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    elif os.path.isfile(path):
        candidates = [path]
    else:
        return None
    for f in candidates:
        try:
            import pyarrow.parquet as pq

            meta = pq.read_schema(f).metadata or {}
        except Exception:  # unreadable footer: keep probing
            continue
        blob = meta.get(b"ww_meta")
        if blob is not None:
            return json.loads(blob.decode("utf-8"))
    return None


def to_archive(ww_df, path, format="parquet", **options):
    """Reference-compatible single-file tar archive: members
    ``/woodwork_typing_info.json`` + ``/data/...``, the exact layout
    ``serializer_base.py::_create_archive`` (reference :117-133)
    produces for S3/remote targets.  The directory is staged in a local
    tempdir and the ONE tar file ships through the Hadoop FS layer, so
    ``path`` may be file://, hdfs://, or s3a:// — the Spark-native
    replacement for the reference's tar+smart_open upload.

    A tar is a single stream: use it for pandas-sized interchange with
    reference installations, not cluster-scale outputs (those stay
    directory layouts via ``to_disk``).
    """
    import os
    import tarfile
    import tempfile

    spark = ww_df.df.sparkSession
    with tempfile.TemporaryDirectory() as tmp:
        staged = os.path.join(tmp, "ww")
        to_disk(ww_df, staged, format=format, **options)
        tar_local = os.path.join(tmp, "archive.tar")
        with tarfile.open(tar_local, "w") as tar:
            tar.add(
                os.path.join(staged, TYPING_INFO_FILENAME),
                arcname=f"/{TYPING_INFO_FILENAME}",
            )
            tar.add(os.path.join(staged, "data"), arcname="/data")
        jvm = spark._jvm
        dst = jvm.org.apache.hadoop.fs.Path(path)
        fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.copyFromLocalFile(
            False, True, jvm.org.apache.hadoop.fs.Path(tar_local), dst,
        )
    return path


def from_archive(spark: SparkSession, path, validate=True):
    """Read a tar archive written by ``to_archive`` OR by the pandas
    reference's S3 serializer (same member layout) — fetched through the
    Hadoop FS layer, extracted to a local tempdir, then handed to the
    directory reader (which also understands reference sidecars and
    ``ww_meta`` parquet blobs).

    NOTE: the extraction tempdir must outlive the returned DataFrame's
    lazy plan, so the frame is materialized eagerly here (archives are
    pandas-sized by contract; cluster-scale data uses directory layouts).
    """
    import os
    import tarfile
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        jvm = spark._jvm
        src = jvm.org.apache.hadoop.fs.Path(path)
        fs = src.getFileSystem(spark._jsc.hadoopConfiguration())
        tar_local = os.path.join(tmp, "archive.tar")
        fs.copyToLocalFile(False, src, jvm.org.apache.hadoop.fs.Path(tar_local), True)
        out_dir = os.path.join(tmp, "extracted")
        with tarfile.open(tar_local) as tar:
            tar.extractall(out_dir, filter="data")
        t = from_disk(spark, out_dir, validate=validate)
        # pin rows before the tempdir vanishes (lazy scans would re-read)
        raw = t.raw
        pinned = spark.createDataFrame(raw.collect(), schema=raw.schema)
        from woodwork_spark.accessor import init_with_full_schema

        return init_with_full_schema(pinned, t.schema, validate=False)
