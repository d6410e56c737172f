"""The two helpers LSUN_dataset.py:3 imports at module-import time."""


def iterable_to_str(iterable):
    return "'" + "', '".join([str(item) for item in iterable]) + "'"


def verify_str_arg(value, arg=None, valid_values=None, custom_msg=None):
    if not isinstance(value, str):
        if custom_msg is not None:
            msg = custom_msg
        else:
            msg = f"Expected type str for argument {arg}, but got type {type(value)}."
        raise ValueError(msg)
    if valid_values is None:
        return value
    if value not in valid_values:
        if custom_msg is not None:
            msg = custom_msg
        else:
            msg = (
                f"Unknown value '{value}' for argument {arg}. "
                f"Valid values are {{{iterable_to_str(valid_values)}}}."
            )
        raise ValueError(msg)
    return value
