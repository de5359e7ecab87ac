from bruin_spark.unittests.runner import UnitTestResult, build_test_query, run_unit_tests

__all__ = ["UnitTestResult", "build_test_query", "run_unit_tests"]
