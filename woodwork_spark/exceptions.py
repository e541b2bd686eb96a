"""Exception and warning vocabulary.

Mirrors the reference's exception surface
(/root/reference/woodwork/exceptions.py:1-99) so user code that catches
these by name keeps working against the Spark engine.
"""


class WoodworkNotInitError(AttributeError):
    """Raised when a woodwork operation is attempted before init."""


class ColumnNotPresentError(KeyError):
    def __init__(self, column):
        if isinstance(column, str):
            super().__init__(f"Column with name '{column}' not found in DataFrame")
        else:
            super().__init__(f"Column(s) '{column}' not found in DataFrame")


class IndexTagRemovedWarning(UserWarning):
    pass


class TypeConversionError(Exception):
    def __init__(self, message_or_series=None, new_dtype=None, logical_type=None):
        if new_dtype is not None or logical_type is not None:
            message = (
                f"Error converting datatype for {getattr(message_or_series, 'name', message_or_series)} "
                f"from type {new_dtype} to type {logical_type}."
            )
        else:
            message = str(message_or_series)
        super().__init__(message)


class TypeConversionWarning(UserWarning):
    pass


class TypeValidationError(Exception):
    pass


class TypingInfoMismatchWarning(UserWarning):
    def get_warning_message(self, attr, invalid_reason, object_type):
        return (
            f"Operation performed by {attr} has invalidated the Woodwork typing information:\n "
            f"{invalid_reason}.\n "
            f"Please initialize Woodwork with {object_type}.ww.init"
        )


class ParametersIgnoredWarning(UserWarning):
    pass


class SparseDataWarning(UserWarning):
    pass


class UpgradeSchemaWarning(UserWarning):
    pass


class OutdatedSchemaWarning(UserWarning):
    pass


class WoodworkFileExistsError(Exception):
    pass
