from projet_data_infrastructure_spark.functions.scalar import (
    bonus_amount,
    decode_epoch_micros,
    full_name,
    is_weekend,
)
from projet_data_infrastructure_spark.functions.hashing import hash64, md5_hex

__all__ = [
    "bonus_amount",
    "decode_epoch_micros",
    "full_name",
    "is_weekend",
    "hash64",
    "md5_hex",
]
