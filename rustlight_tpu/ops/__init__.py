from .gather import table_take
