"""JDBC scan smoke (SURVEY.md §2a S1 <- reference extraction.py:30-41).

No MySQL exists in this container, so the JDBC code path is exercised
against Apache Derby's EMBEDDED driver (ships inside the PySpark
distribution for the Hive metastore — no extra install). The semantics
under test are Spark's real JDBC source: driver-managed connections,
schema-from-metadata, and partitioned range reads producing one query per
partition.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from healthcare_rcm_etl_pipeline_spark.sources.readers import read_jdbc

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_db(spark):
    """Seed a Derby database with a patients-like table through plain JDBC
    (via the JVM gateway — same classpath Spark's JDBC source uses)."""
    d = tempfile.mkdtemp(prefix="hrcm_derby_")
    db = os.path.join(d, "seeddb")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE patients (patient_id INT PRIMARY KEY, name VARCHAR(64), amount DOUBLE)"
    )
    ps = conn.prepareStatement("INSERT INTO patients VALUES (?, ?, ?)")
    for i in range(1000):
        ps.setInt(1, i)
        ps.setString(2, f"patient_{i:04d}")
        ps.setDouble(3, float(i) * 1.5)
        ps.addBatch()
    ps.executeBatch()
    ps.close()
    st.close()
    conn.close()
    yield f"jdbc:derby:{db}"
    try:
        # Derby requires an explicit shutdown of the database
        jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};shutdown=true")
    except Exception:
        pass  # shutdown always signals via SQLException
    shutil.rmtree(d, ignore_errors=True)


def test_jdbc_scan_reads_all_rows(spark, derby_db):
    df = read_jdbc(spark, derby_db, "patients", properties={"driver": DERBY_DRIVER})
    assert df.count() == 1000
    assert set(c.lower() for c in df.columns) == {"patient_id", "name", "amount"}
    row = df.filter(df.PATIENT_ID == 7).collect()[0]
    assert row["NAME"] == "patient_0007" and row["AMOUNT"] == 10.5


def test_jdbc_partitioned_read_splits_and_agrees(spark, derby_db):
    df = read_jdbc(
        spark,
        derby_db,
        "patients",
        properties={"driver": DERBY_DRIVER},
        partition_column="patient_id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
    )
    # the scan really is split: one range query per partition
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    total = df.agg({"AMOUNT": "sum"}).collect()[0][0]
    assert total == sum(i * 1.5 for i in range(1000))


def test_jdbc_pushdown_filters_at_source(spark, derby_db):
    df = read_jdbc(spark, derby_db, "patients", properties={"driver": DERBY_DRIVER})
    filtered = df.filter(df.PATIENT_ID < 10).select("PATIENT_ID")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # Spark pushes the predicate into the JDBC source (PushedFilters)
    assert "PushedFilters" in plan and "PATIENT_ID" in plan
    assert filtered.count() == 10
