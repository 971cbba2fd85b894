"""The reference README's own example scenarios, end-to-end
(/root/reference/README.md "Example SQL Queries ..."): a transaction with
CREATE/INSERT/SELECT, the department-average JOIN aggregation over
employees/salaries (FIXTURES.md §A2-A3 shapes), and time travel. These are
the queries a reference user would run on day one after switching."""

from __future__ import annotations

import pytest

from entangledb_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "db"))


def test_readme_transaction_example(eng):
    eng.execute("BEGIN")
    eng.execute(
        "CREATE TABLE employees (id INT PRIMARY KEY, name VARCHAR, department VARCHAR)"
    )
    eng.execute(
        "INSERT INTO employees VALUES (1, 'Alice', 'Engineering'), (2, 'Bob', 'HR')"
    )
    r = eng.execute("SELECT * FROM employees")
    assert sorted(r.rows) == [(1, "Alice", "Engineering"), (2, "Bob", "HR")]
    eng.execute("COMMIT")
    assert len(eng.execute("SELECT * FROM employees").rows) == 2


def test_readme_join_aggregation(eng):
    eng.execute(
        "CREATE TABLE employees (id INT PRIMARY KEY, name VARCHAR, department VARCHAR)"
    )
    eng.execute(
        "CREATE TABLE salaries (id INT PRIMARY KEY, emp_id INT NOT NULL REFERENCES employees, "
        "salary FLOAT, year INT NOT NULL)"
    )
    eng.execute(
        "INSERT INTO employees VALUES (1, 'Alice', 'Engineering'), (2, 'Bob', 'HR'), "
        "(3, 'Carol', 'Engineering')"
    )
    # duplicate emp_id values — the reference's HashJoin drops these (its
    # one-row-per-key bug, SURVEY §2.3); SQL semantics keep them
    eng.execute(
        "INSERT INTO salaries VALUES (1, 1, 100.0, 2023), (2, 1, 110.0, 2024), "
        "(3, 2, 90.0, 2024), (4, 3, 120.0, 2024)"
    )
    r = eng.execute(
        "SELECT department, avg(salary) AS avg_salary FROM employees "
        "JOIN salaries ON employees.id = salaries.emp_id GROUP BY department "
        "ORDER BY department"
    )
    assert r.rows == [("Engineering", 110.0), ("HR", 90.0)]


def test_readme_time_travel(eng):
    eng.execute("CREATE TABLE employees (id INT PRIMARY KEY, name VARCHAR)")
    v_before = eng.catalog.current_version()
    eng.execute("INSERT INTO employees VALUES (1, 'Alice')")
    v_after = eng.catalog.current_version()
    eng.execute("UPDATE employees SET name = 'Alicia' WHERE id = 1")
    # the reference's AS OF takes an MVCC version number (parser/mod.rs:
    # 324-352 — the README's '-5m' wall-clock form never shipped)
    eng.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v_after}")
    assert eng.execute("SELECT name FROM employees").rows == [("Alice",)]
    eng.execute("COMMIT")
    eng.execute(f"BEGIN READ ONLY AS OF SYSTEM TIME {v_before}")
    assert eng.execute("SELECT count(*) FROM employees").rows == [(0,)]
    eng.execute("COMMIT")
    assert eng.execute("SELECT name FROM employees").rows == [("Alicia",)]
