"""HTML main-content extraction — golden tests freezing the [NORTH-ONLY] spec
so byte-identical extracted text per url is a testable invariant."""

from pii_core.html_extract import html_to_text


def test_empty_inputs():
    assert html_to_text(None) == ""
    assert html_to_text(b"") == ""
    assert html_to_text("   ") == ""
    assert html_to_text(b"\xff\xfe\x00") == ""  # undecodable -> replaced, no text


def test_strips_nav_footer_script():
    html = b"""<html><head><title>T</title><script>var x=1;</script></head><body>
    <nav><a href="/">Home</a> <a href="/a">A</a></nav>
    <p>Este paragrafo tem conteudo principal suficiente para ser mantido.</p>
    <footer>copyright 2026 todos os direitos</footer>
    <style>p{color:red}</style>
    </body></html>"""
    out = html_to_text(html)
    assert out == "Este paragrafo tem conteudo principal suficiente para ser mantido."


def test_boilerplate_class_hint_dropped():
    html = b"""<body>
    <div class="sidebar promo">Oferta imperdivel clique aqui agora mesmo sim.</div>
    <div class="content">Texto central do documento com informacao relevante.</div>
    </body>"""
    out = html_to_text(html)
    assert out == "Texto central do documento com informacao relevante."


def test_link_density_filter():
    html = b"""<body>
    <p><a href="/1">um link</a> <a href="/2">outro link</a> <a href="/3">mais um link aqui</a></p>
    <p>Paragrafo normal com texto corrido e nenhuma ancora de navegacao.</p>
    </body>"""
    out = html_to_text(html)
    assert out == "Paragrafo normal com texto corrido e nenhuma ancora de navegacao."


def test_headings_kept_with_lower_threshold():
    html = b"<body><h1>Pedido LAI</h1><p>Corpo do pedido com detalhes suficientes aqui.</p></body>"
    assert html_to_text(html) == "Pedido LAI\n\nCorpo do pedido com detalhes suficientes aqui."


def test_short_blocks_dropped():
    html = b"<body><p>curto</p><p>Este bloco e longo o bastante para passar do limite.</p></body>"
    assert html_to_text(html) == "Este bloco e longo o bastante para passar do limite."


def test_entities_and_whitespace_normalized():
    html = b"<body><p>Jo&atilde;o   foi \n ao centro &amp; voltou cedo demais hoje.</p></body>"
    assert html_to_text(html) == "João foi ao centro & voltou cedo demais hoje."


def test_golden_full_page():
    html = b"""<html><body>
    <header><div class="menu"><a>x</a></div></header>
    <main>
      <h2>Processo 04021-00012345/2024-11</h2>
      <p>Solicito acesso aos autos. Contato: maria@example.com ou (61) 98888-7777.</p>
      <ul><li>Documento pessoal: CPF 529.982.247-25 conforme anexo enviado.</li></ul>
    </main>
    <aside>veja tambem outras paginas relacionadas</aside>
    </body></html>"""
    expect = (
        "Processo 04021-00012345/2024-11\n\n"
        "Solicito acesso aos autos. Contato: maria@example.com ou (61) 98888-7777.\n\n"
        "Documento pessoal: CPF 529.982.247-25 conforme anexo enviado."
    )
    assert html_to_text(html) == expect


def test_void_boilerplate_tag_does_not_drop_following_content():
    # Regression: a boilerplate-classed VOID tag (<img>, <input>) is never
    # pushed on the stack, so if it incremented _drop_depth nothing would
    # ever decrement it and all following text vanished (fail-open PII risk).
    html = b"""<body>
    <img class="footer-logo" src="x.png">
    <p>Conteudo apos a imagem decorativa deve permanecer visivel aqui.</p>
    <input id="comment" type="text">
    <p>E este texto apos o campo de comentario tambem deve permanecer.</p>
    </body>"""
    assert html_to_text(html) == (
        "Conteudo apos a imagem decorativa deve permanecer visivel aqui.\n\n"
        "E este texto apos o campo de comentario tambem deve permanecer."
    )


def test_block_close_with_open_boilerplate_child_still_flushes():
    # Regression: </div> closing a block that wraps a still-open boilerplate
    # child must flush the text accumulated before the child opened.
    html = (
        b'<body><div>Texto principal do bloco externo antes do anuncio aqui.'
        b'<span class="ad">compre agora</span></div>'
        b"<p>Segundo bloco de conteudo relevante apos o primeiro terminar.</p></body>"
    )
    assert html_to_text(html) == (
        "Texto principal do bloco externo antes do anuncio aqui.\n\n"
        "Segundo bloco de conteudo relevante apos o primeiro terminar."
    )


def test_stray_void_block_end_tag_delimits_blocks():
    # </br> with no matching open element occurs in wild HTML and must still
    # delimit blocks (it is a block tag even when stray).
    html = (
        b"<body>Primeira linha de texto longa o suficiente para manter.</br>"
        b"Segunda linha igualmente longa o suficiente para ser mantida.</body>"
    )
    assert html_to_text(html) == (
        "Primeira linha de texto longa o suficiente para manter.\n\n"
        "Segunda linha igualmente longa o suficiente para ser mantida."
    )


def test_deterministic():
    html = b"<body><p>Conteudo principal repetivel e deterministico sem estado.</p></body>"
    assert html_to_text(html) == html_to_text(html)
