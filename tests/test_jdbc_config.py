"""JDBC config parsing / URL construction (the read path itself needs
driver jars absent from this container — SURVEY.md §2.1 plugin
replacement)."""

from __future__ import annotations

from octosql_spark.sources.jdbc import (
    _parse_mini_yaml, database_by_name, jdbc_url, load_config,
)

YML = """
databases:
  - name: mydb
    type: postgres
    config:
      host: localhost
      port: 5433
      database: main
      user: u
      password: p
  - name: lite
    type: sqlite
    config:
      database: /tmp/x.db
"""


def test_mini_yaml_and_urls(tmp_path):
    cfg = _parse_mini_yaml(YML)
    assert len(cfg["databases"]) == 2
    db = database_by_name(cfg, "mydb")
    assert db["type"] == "postgres"
    assert jdbc_url(db) == "jdbc:postgresql://localhost:5433/main"
    assert jdbc_url(database_by_name(cfg, "lite")) == "jdbc:sqlite:/tmp/x.db"


def test_load_config_missing_file(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert load_config() == {"databases": []}
    p = tmp_path / "octosql.yml"
    p.write_text(YML)
    cfg = load_config(str(p))
    assert database_by_name(cfg, "mydb")["config"]["port"] == 5433


def test_db_table_resolution_through_transpiler(spark, tmp_path, monkeypatch):
    """`FROM mydb.people` resolves through the configured database
    (jdbc_table monkeypatched: no driver jars in this container)."""
    (tmp_path / "octosql.yml").write_text(
        "databases:\n  - name: mydb\n    type: sqlite\n"
        "    config:\n      database: /tmp/x.db\n")
    monkeypatch.chdir(tmp_path)

    import octosql_spark.sources.jdbc as jdbc_mod
    calls = {}

    def fake_jdbc_table(spark_, db, table, **kw):
        calls["db"] = db["name"]
        calls["table"] = table
        return spark_.createDataFrame([(1, "a"), (2, "b")], "id int, name string")

    monkeypatch.setattr(jdbc_mod, "jdbc_table", fake_jdbc_table)
    from octosql_spark.sql import run_query
    df = run_query(spark, "SELECT name FROM mydb.people WHERE id = 2").df
    assert [r.name for r in df.collect()] == ["b"]
    assert calls == {"db": "mydb", "table": "people"}


def test_jdbc_integration_derby(spark, tmp_path):
    """REAL JDBC round trip against embedded Derby (shipped in Spark's
    jars for the Hive metastore): create + populate a table through
    the JVM driver, read it back through jdbc_table — both the
    single-cursor path and the partitioned path with auto-probed
    MIN/MAX bounds (the partitionColumn/bounds/numPartitions
    foursome)."""
    from octosql_spark.sources.jdbc import jdbc_table
    dbdir = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{dbdir};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE people (id INT, name VARCHAR(32), age INT)")
    for i, (n, a) in enumerate([("ann", 31), ("bob", 17), ("cho", 42),
                                ("dee", 55), ("eli", 23)]):
        st.execute(f"INSERT INTO people VALUES ({i}, '{n}', {a})")
    st.close()
    conn.close()

    db = {"name": "d", "type": "derby", "config": {"url": f"jdbc:derby:{dbdir}"}}
    df = jdbc_table(spark, db, "people")
    assert df.count() == 5
    # predicate pushdown reaches the JDBC source
    adults = jdbc_table(spark, db, "people").filter("age >= 21")
    assert {r.NAME for r in adults.collect()} == {"ann", "cho", "dee", "eli"}
    plan = adults._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "age" in plan.lower()

    # partitioned parallel read with probed bounds
    part = jdbc_table(spark, db, "people", partition_column="id",
                      num_partitions=3)
    assert part.rdd.getNumPartitions() == 3
    assert sorted(r.ID for r in part.collect()) == [0, 1, 2, 3, 4]


def test_jdbc_through_sql_front_door(spark, tmp_path, monkeypatch):
    """`FROM db.table` through the SQL surface resolves the database
    from octosql.yml config and reads over real JDBC (embedded Derby)
    — the reference's plugin-database UX end-to-end."""
    dbdir = str(tmp_path / "derbydb2")
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{dbdir};create=true")
    st = conn.createStatement()
    st.execute("CREATE TABLE pets (id INT, species VARCHAR(16))")
    for i, s in enumerate(["cat", "dog", "cat", "axolotl"]):
        st.execute(f"INSERT INTO pets VALUES ({i}, '{s}')")
    st.close()
    conn.close()

    cfg = tmp_path / "octosql.yml"
    cfg.write_text(
        "databases:\n"
        "  - name: zoo\n"
        "    type: derby\n"
        "    config:\n"
        f"      url: jdbc:derby:{dbdir}\n")
    monkeypatch.setenv("OCTOSQL_CONFIG", str(cfg))

    from octosql_spark.sql import run_query
    out = run_query(
        spark,
        "SELECT species, COUNT(*) AS n FROM zoo.pets "
        "GROUP BY species ORDER BY n DESC, species").df.collect()
    assert [(r[0], r[1]) for r in out] == [("cat", 2), ("axolotl", 1),
                                           ("dog", 1)]
