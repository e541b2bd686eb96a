from woodwork_spark.type_sys.type_system import TypeSystem, type_system

__all__ = ["TypeSystem", "type_system"]
