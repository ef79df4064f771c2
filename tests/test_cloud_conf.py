"""Cloud provisioning conf builder — exact-value tests mirroring the
reference's init_script() string assertions (src/cli/options.rs:238-428)."""

from __future__ import annotations

from uquery_rs_spark.sources.cloud import cloud_spark_conf


def test_empty_by_default():
    assert cloud_spark_conf() == {}


def test_aws_credential_chain():
    conf = cloud_spark_conf(aws_credential_chain=True)
    assert conf == {
        "spark.hadoop.fs.s3a.aws.credentials.provider": (
            "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
        )
    }


def test_gcs_hmac_keys():
    conf = cloud_spark_conf(gcs_key_id="AKI", gcs_secret="shh")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "https://storage.googleapis.com"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AKI"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "shh"


def test_gcs_hmac_takes_precedence_over_chain():
    # mirrors options.rs: keys win over credential_chain when both given
    conf = cloud_spark_conf(gcs_key_id="k", gcs_secret="s", gcs_credential_chain=True)
    assert "spark.hadoop.fs.gs.auth.type" not in conf


def test_gcs_credential_chain():
    conf = cloud_spark_conf(gcs_credential_chain=True)
    assert conf == {"spark.hadoop.fs.gs.auth.type": "APPLICATION_DEFAULT"}


def test_iceberg_rest_catalog():
    conf = cloud_spark_conf(
        ic_catalog_endpoint="https://rest.example/v1",
        ic_catalog_name="wh",
        ic_user="cid",
        ic_secret="csec",
    )
    assert conf["spark.sql.catalog.iceberg"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.iceberg.type"] == "rest"
    assert conf["spark.sql.catalog.iceberg.uri"] == "https://rest.example/v1"
    assert conf["spark.sql.catalog.iceberg.warehouse"] == "wh"
    assert conf["spark.sql.catalog.iceberg.credential"] == "cid:csec"


def test_iceberg_requires_all_four():
    # mirrors options.rs: partial iceberg config attaches nothing
    assert cloud_spark_conf(ic_catalog_endpoint="e", ic_catalog_name="n") == {}
