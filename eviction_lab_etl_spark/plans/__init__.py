from eviction_lab_etl_spark.plans.audit import audit_plan, audit_all

__all__ = ["audit_plan", "audit_all"]
