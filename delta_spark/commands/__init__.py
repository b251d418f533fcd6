"""Table commands: DML (DELETE/UPDATE/MERGE), layout (OPTIMIZE/VACUUM),
lifecycle (RESTORE/CLONE/CONVERT/TRUNCATE), mirroring the reference's
spark/sql/delta/commands/ package — re-expressed as DataFrame plans.
"""
