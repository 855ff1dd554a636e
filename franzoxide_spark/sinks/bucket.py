"""S3 bucket bootstrap (A21): ensure the sink's target bucket exists.

Mirrors the reference sink's initialize() step — head_bucket, create on
miss, hard error when creation fails
(/root/reference/src/connector/sink/s3.rs:463-496). Spark's s3a committer
never creates buckets, so without this step a reference-style config
pointed at a fresh MinIO would only fail at the first stream commit;
running it before ``writeStream.start()`` restores the reference's
fail-at-initialize contract.

boto3 is used only here (control-plane, driver-side, once per sink start);
the data plane stays on the Hadoop s3a connector.
"""

from __future__ import annotations

from franzoxide_spark.errors import ConfigError, SinkError


def build_client(cfg: dict[str, str]):
    """boto3 S3 client from the connector's ``s3.*`` keys (endpoint /
    path-style / static creds mirror s3.rs:417-461). Without static creds
    the SDK's default provider chain is consulted, exactly like the
    reference's aws-sdk client; if nothing resolves, fail with ConfigError
    instead of letting the first API call die cryptically."""
    try:
        import boto3
    except ImportError as e:  # pragma: no cover - boto3 present in env
        raise SinkError(
            "bucket bootstrap requires boto3 (not present); create the"
            " bucket out-of-band or set 's3.bucket.ensure': 'false'"
        ) from e

    kwargs: dict[str, object] = {}
    if cfg.get("s3.endpoint"):
        kwargs["endpoint_url"] = cfg["s3.endpoint"]
    if cfg.get("s3.region"):
        kwargs["region_name"] = cfg["s3.region"]
    if cfg.get("s3.access.key"):
        kwargs["aws_access_key_id"] = cfg["s3.access.key"]
        kwargs["aws_secret_access_key"] = cfg.get("s3.secret.key", "")
    else:
        session = boto3.session.Session()
        if session.get_credentials() is None:
            raise ConfigError(
                "no S3 credentials: set 's3.access.key'/'s3.secret.key' in"
                " the connector config or provide ambient AWS credentials"
            )
    return boto3.client("s3", **kwargs)


def ensure_bucket(cfg: dict[str, str], client=None) -> str:
    """Head-then-create (s3.rs:465-490). Returns 'exists' or 'created';
    raises SinkError when the bucket can neither be reached nor created.
    ``client`` is injectable for tests / custom credential flows."""
    bucket = cfg.get("s3.bucket.name")
    if not bucket:
        raise ConfigError("bucket bootstrap needs 's3.bucket.name'")
    if client is None:
        client = build_client(cfg)
    try:
        client.head_bucket(Bucket=bucket)
        return "exists"
    except Exception as head_err:
        # Only a missing-bucket response falls through to create; an auth
        # failure, unreachable endpoint, or TLS error must surface as the
        # real problem instead of being masked by a doomed create_bucket
        # attempt (ADVICE r2).
        code = ""
        resp = getattr(head_err, "response", None)
        if isinstance(resp, dict):
            code = str(resp.get("Error", {}).get("Code", ""))
        if code not in ("404", "NoSuchBucket", "NotFound"):
            raise SinkError(
                f"bucket {bucket!r} not reachable (head_bucket failed with"
                f" {type(head_err).__name__}: {head_err})"
            ) from head_err
    region = cfg.get("s3.region")
    create_kwargs: dict[str, object] = {"Bucket": bucket}
    if region and region != "us-east-1":
        create_kwargs["CreateBucketConfiguration"] = {
            "LocationConstraint": region
        }
    try:
        client.create_bucket(**create_kwargs)
        return "created"
    except Exception as e:
        raise SinkError(f"failed to create bucket {bucket!r}: {e}") from e
