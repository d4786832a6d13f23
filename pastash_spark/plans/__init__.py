"""Pipeline plans: declarative stage specs composed into one Catalyst DAG."""
