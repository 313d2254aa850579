import java.io.*;
import java.lang.reflect.Method;
import java.nio.charset.StandardCharsets;
import java.util.Base64;

import search.external.PorterStemmer;
import search.jobs.Indexer;
import search.tools.Hasher;

/**
 * Golden-output generator: reads base64-encoded lines from stdin, writes
 * base64-encoded reference outputs to stdout. Used ONLY to produce committed
 * test fixtures; never shipped.
 *
 * Modes:
 *   stem           - PorterStemmer over each input token (raw, no lowercase)
 *   extract_title  - Indexer.removeTagsAndPunctuation (title-only pipeline)
 *   extract_titlep - TF_IDF.removeHTMLTagsAndPunctuation (title+p, via reflection)
 *   hash           - Hasher.hash
 */
public class GoldenGen {
    public static void main(String[] args) throws Exception {
        String mode = args[0];
        Method titlep = null;
        if (mode.equals("extract_titlep")) {
            Class<?> c = Class.forName("search.jobs.TF_IDF");
            titlep = c.getDeclaredMethod("removeHTMLTagsAndPunctuation", String.class);
            titlep.setAccessible(true);
        }
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintWriter out = new PrintWriter(new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
        Base64.Decoder dec = Base64.getDecoder();
        Base64.Encoder enc = Base64.getEncoder();
        String line;
        while ((line = in.readLine()) != null) {
            String input = new String(dec.decode(line), StandardCharsets.UTF_8);
            String result;
            switch (mode) {
                case "stem": {
                    PorterStemmer st = new PorterStemmer();
                    st.add(input.toCharArray(), input.length());
                    st.stem();
                    result = st.toString();
                    break;
                }
                case "extract_title":
                    result = Indexer.removeTagsAndPunctuation(input);
                    break;
                case "extract_titlep":
                    result = (String) titlep.invoke(null, input);
                    break;
                case "hash":
                    result = Hasher.hash(input);
                    break;
                default:
                    throw new IllegalArgumentException(mode);
            }
            out.println(enc.encodeToString(result.getBytes(StandardCharsets.UTF_8)));
        }
        out.flush();
    }
}
