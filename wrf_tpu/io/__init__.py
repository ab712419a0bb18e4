from .codec import (
    read_field, read_flag, read_int, read_real,
    write_field, write_flag, write_int, write_real,
)
