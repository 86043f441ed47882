from .planner import BuildPlan, plan_bloom_build

__all__ = ["BuildPlan", "plan_bloom_build"]
