"""Shared physical-plan inspection helper for the plan-pin suites.

One home for the private-JVM-API call (PythonSQLUtils.explainString) so a
PySpark upgrade that moves/renames it is a one-line fix, not four.
"""


def explain_formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
