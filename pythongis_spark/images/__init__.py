from pythongis_spark.images.codec import (  # noqa: F401
    encode_image,
    decode_image,
    make_pixels,
    average_phash,
    psnr_db,
)
