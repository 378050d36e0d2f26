"""S3A object-store profile: the Hadoop configuration a production
deployment applies so the engine reads/writes ``s3a://`` URIs directly.

Reference surface: the reference uploads results to MinIO with a per-op
client (``common/io/minio_upload_op.py:27-41``). Spark-first, the same
capability is NOT a client loop — it is the S3A filesystem connector, so
every existing source/sink (parquet scans, CSV/JSONL sinks, streaming
checkpoints) works against the object store unchanged, with split
computation, committers and retries handled by the platform layer.

Two deliberate design points for 100 TB:

- **Magic committer, never rename-based commit.** The default Hadoop
  commit protocol renames task output into place; on S3 a "rename" is a
  COPY+DELETE of every byte — an O(data) driver-side tail on each job. The
  S3A *magic committer* commits via multipart-upload completion (an O(1)
  metadata call per file), which is the difference between a 100 TB write
  finishing and it re-copying 100 TB.
- **`random` fadvise for columnar scans.** Parquet readers seek between
  column chunks; sequential-readahead streams throw away most of what they
  fetch. `fs.s3a.experimental.input.fadvise=random` makes the connector
  range-GET exactly the requested byte ranges.

The hadoop-aws jars are not present in this sandbox, so tests assert the
profile lands in the live Hadoop configuration (which works without
network) rather than performing a real transfer — same seam discipline as
the media decode stub (`operators/multimodal.py`).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: committer factory Hadoop looks up for the s3a scheme
_S3A_COMMITTER_FACTORY = (
    "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
)


def s3a_profile(
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    *,
    path_style_access: bool = False,
    committer: str = "magic",
    fadvise: str = "random",
    max_connections: int = 96,
) -> dict[str, str]:
    """Build the Hadoop conf map for an S3-compatible store.

    ``endpoint`` + ``path_style_access=True`` is the MinIO shape (the
    reference's store); leave both defaulted for AWS S3. Credentials fall
    back to the default provider chain (instance profile / env) when the
    keys are omitted — never hardcode keys in production images.
    """
    conf: dict[str, str] = {
        # commit protocol: multipart-complete, not copy-rename
        "fs.s3a.committer.name": committer,
        "fs.s3a.committer.magic.enabled": "true",
        "mapreduce.outputcommitter.factory.scheme.s3a": _S3A_COMMITTER_FACTORY,
        # columnar-friendly reads + bounded connection pool
        "fs.s3a.experimental.input.fadvise": fadvise,
        "fs.s3a.connection.maximum": str(max_connections),
        "fs.s3a.fast.upload": "true",
        "fs.s3a.multipart.size": "128M",
        # directory markers: keep (list-consistency-safe on modern S3 and
        # saves a DELETE storm per directory at scale)
        "fs.s3a.directory.marker.retention": "keep",
    }
    if endpoint:
        conf["fs.s3a.endpoint"] = endpoint
    if path_style_access:
        conf["fs.s3a.path.style.access"] = "true"
    if access_key and secret_key:
        conf["fs.s3a.access.key"] = access_key
        conf["fs.s3a.secret.key"] = secret_key
        conf["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
        )
    return conf


def apply_s3a_profile(spark: SparkSession, profile: dict[str, str]) -> None:
    """Apply the profile to the session's live Hadoop configuration (takes
    effect for every subsequent s3a:// read/write and checkpoint)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in profile.items():
        hconf.set(k, v)


def s3a_path(bucket: str, key: str = "") -> str:
    """Canonical ``s3a://bucket/key`` URI (the scheme the S3A connector —
    not the legacy s3n/s3 ones — binds to)."""
    key = key.lstrip("/")
    return f"s3a://{bucket}/{key}" if key else f"s3a://{bucket}"
