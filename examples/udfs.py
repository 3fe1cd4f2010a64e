# Script UDFs for examples/udfs_and_compat.pig (Pig @outputSchema style).


@outputSchema('net:double')
def net_price(price, disc):
    return price * (1.0 - disc)


def classify(qty) -> str:
    return "small" if qty < 10 else "large"
