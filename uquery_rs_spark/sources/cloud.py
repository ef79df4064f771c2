"""Cloud credential / catalog configuration (reference init-script parity).

The reference provisions cloud access by running CREATE SECRET / ATTACH
statements at startup (src/cli/options.rs:150-200): GCS HMAC keys or
credential chain, AWS credential chain, and an Iceberg REST catalog.
Spark's equivalent is session configuration, built here as a pure dict so
it unit-tests exactly like the reference's init_script() string tests
(options.rs:238-428).

Connector jars (hadoop-aws, gcs-connector, iceberg-spark-runtime) are
deployment-time dependencies; setting the conf without them is harmless
until a path/catalog is actually touched.
"""

from __future__ import annotations

# DuckDB's GCS secret type takes HMAC keys for GCS's S3-interoperability
# XML API (reference options.rs:163-165). The Spark equivalent is s3a
# pointed at the interop endpoint with the same HMAC pair.
_GCS_INTEROP_ENDPOINT = "https://storage.googleapis.com"


def cloud_spark_conf(
    gcs_key_id: str | None = None,
    gcs_secret: str | None = None,
    gcs_credential_chain: bool = False,
    aws_credential_chain: bool = False,
    ic_catalog_endpoint: str | None = None,
    ic_catalog_name: str | None = None,
    ic_user: str | None = None,
    ic_secret: str | None = None,
) -> dict[str, str]:
    """Spark conf mirroring the reference's startup provisioning flags."""
    conf: dict[str, str] = {}

    if gcs_key_id and gcs_secret:
        # CREATE SECRET (TYPE GCS, KEY_ID, SECRET) → s3a over the GCS
        # S3-interop endpoint with the HMAC pair (options.rs:163-165).
        conf["spark.hadoop.fs.s3a.endpoint"] = _GCS_INTEROP_ENDPOINT
        conf["spark.hadoop.fs.s3a.access.key"] = gcs_key_id
        conf["spark.hadoop.fs.s3a.secret.key"] = gcs_secret
        conf["spark.hadoop.fs.s3a.path.style.access"] = "true"
    elif gcs_credential_chain:
        # CREATE SECRET (TYPE gcs, PROVIDER credential_chain) → the GCS
        # connector's application-default credentials (options.rs:15-19).
        conf["spark.hadoop.fs.gs.auth.type"] = "APPLICATION_DEFAULT"

    if aws_credential_chain:
        # CREATE SECRET (TYPE s3, PROVIDER credential_chain) → hadoop-aws
        # default chain: env vars → profile → instance metadata
        # (options.rs:11-13).
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
        )

    if ic_catalog_endpoint and ic_catalog_name and ic_user and ic_secret:
        # ATTACH (TYPE iceberg, ENDPOINT) + iceberg secret → Spark's native
        # Iceberg REST catalog with OAuth2 client credentials
        # (options.rs:175-181). Catalog name 'iceberg' matches the
        # reference's attached alias.
        pfx = "spark.sql.catalog.iceberg"
        conf[pfx] = "org.apache.iceberg.spark.SparkCatalog"
        conf[f"{pfx}.type"] = "rest"
        conf[f"{pfx}.uri"] = ic_catalog_endpoint
        conf[f"{pfx}.warehouse"] = ic_catalog_name
        conf[f"{pfx}.credential"] = f"{ic_user}:{ic_secret}"

    return conf
