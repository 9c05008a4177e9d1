from vector_db_ingestor_spark.plans.guard import (  # noqa: F401
    PlanViolation,
    assert_scalable,
    plan_report,
)
