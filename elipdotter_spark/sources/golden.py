"""Golden corpus transcribed from the reference test suite (FIXTURES.md §2).

Sources: /root/reference/tests/lib.rs:16-27 (lorem docs),
/root/reference/src/index.rs:1362-1363 (AND-NOT pair),
/root/reference/src/index.rs:1386-1412 (Swedish corpus).
"""

DOC1 = (
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit. Mauris interdum, "
    "metus ut consectetur ullamcorper, velit mi placerat diam, vitae rutrum quam "
    "magna sit amet lacus. Curabitur ut rutrum ante. Pellentesque vel neque ante. "
    "Nullam vel velit ut ipsum luctus varius id porta nisi. Morbi hendrerit, nunc "
    "non consequat consequat, dolor mi consectetur eros, vitae varius diam leo in "
    "sem. Aliquam erat volutpat. Proin id mollis quam. Morbi venenatis tincidunt "
    "nunc eget ullamcorper. Cras hendrerit libero enim, et aliquet diam rutrum ut. "
    "Duis auctor ligula libero, cursus ullamcorper libero porttitor eget. Aliquam "
    "scelerisque ac elit at condimentum. Fusce sit amet purus posuere, suscipit "
    "libero id, tincidunt nulla. Aliquam molestie orci vitae tellus commodo, nec "
    "mattis purus efficitur. Quisque quam nisl, fermentum sit amet ante vitae, "
    "finibus aliquet nunc. Ut ut hendrerit lorem.\n\n"
    "Nam porttitor urna leo, sit amet imperdiet libero vulputate sed. Morbi "
    "elementum ligula turpis, at mattis risus finibus vitae. Vestibulum id egestas "
    "tortor. Curabitur suscipit nulla dolor. Duis rhoncus et felis dignissim "
    "bibendum. Sed congue arcu quis lacinia iaculis. Nam sit amet lacus sit amet "
    "lacus efficitur bibendum."
)

DOC2 = (
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit. Nulla lectus orci, "
    "aliquam ut justo varius, consequat semper enim. Vestibulum porttitor justo "
    "sed tincidunt fringilla. Donec sit amet sollicitudin mi, eu bibendum orci. "
    "Maecenas at feugiat ipsum. Vestibulum libero dolor, egestas et sollicitudin "
    "eu, ornare sit amet mauris. Maecenas in dolor volutpat, rhoncus urna id, "
    "luctus sem. Nulla pulvinar non ex eu venenatis.\n\n"
    "Aliquam euismod, justo eu viverra ornare, ex nisi interdum neque, in rutrum "
    "nunc mi sit amet libero. Aenean nec arcu pulvinar, venenatis erat ac, sodales "
    "massa. Morbi quam leo, cursus at est a, placerat aliquam mauris. Pellentesque "
    "habitant morbi tristique senectus et netus et malesuada fames ac turpis "
    "egestas. In hac habitasse platea dictumst. In consectetur aliquet aliquam. In "
    "vel tempor elit, eget auctor dolor. Phasellus molestie est eget posuere "
    "imperdiet. Donec sagittis tincidunt facilisis. Sed eu pulvinar lectus, "
    "euismod dictum tellus. Nulla lacinia diam quis odio ultrices, viverra dictum "
    "arcu mollis. Donec tempor diam eget tristique maximus. Etiam a dui eu augue "
    "euismod dignissim."
)

AN1_DOC1 = "organization stop"
AN1_DOC3 = "organization hello"

SV_DOC1 = (
    "Stop breathing - save the planet\n"
    "Som vår kära SD-politker påpekade, människor andas ut co2! Genom att begå "
    "massmord kan vi rädda planeten. Dessutom kommer människor inte kunna "
    "förstöra klimatet om vi inte existerar!\n"
    "SB for the planet's futute!"
)
SV_DOC2 = "Sydkusten Marathon\nVi springer. Ganska klimatsmart 🏆"
SV_DOC3 = "Mathilda\nMathildas egna grupp"
SV_DOC4 = "PSKG\nhejsan hejsan"
SV_DOC5 = "Klimatvampyrerna\nVi vill ha erat blooooooood"

LOREM_CORPUS = [("doc 1", DOC1), ("doc_2", DOC2)]
AN1_CORPUS = [("doc1", AN1_DOC1), ("doc3", AN1_DOC3)]
SV_CORPUS = [
    ("doc1", SV_DOC1),
    ("doc2", SV_DOC2),
    ("doc3", SV_DOC3),
    ("doc4", SV_DOC4),
    ("doc5", SV_DOC5),
]
